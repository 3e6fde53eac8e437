package graft.ext

import org.scalatest.concurrent.TimeLimits
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

/** Adversarial-input hardening for the pixel codecs: crafted payloads
  * must fail fast and bounded, never hang a thread or balloon memory —
  * at 100 TB the decode UDFs see whatever bytes the corpus contains.
  */
class PixelCodecSpec extends AnyFunSuite with TimeLimits {

  /** zlib stream header with the FDICT preset-dictionary bit set
    * (CMF=0x78, FLG=0x20 — check bits valid: (0x7820 % 31) == 0).
    * Inflater reports needsDictionary(): inflate() returns 0 with
    * needsInput() false — a naive read loop spins forever on it.
    */
  private def fdictPng(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(data.length); out.write(typ.getBytes("US-ASCII"))
      out.write(data, 0, data.length); be32(0) // CRC unverified by decoder
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new java.io.ByteArrayOutputStream()
    def ibe32(v: Int): Unit = {
      ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ibe32(w); ibe32(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4)) // FDICT header + DICTID
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A GIF "LZW bomb": an 8×8 frame whose code stream first fills the
    * 4096-entry table with ever-longer strings, then references the
    * longest entry (~4 KB expansion) hundreds of thousands of times —
    * ~0.4 MB of codes that would expand to ~1 GB of indices if the
    * decoder ignored the frame's 64-pixel budget.
    */
  private def lzwBombGif(tailRefs: Int): Array[Byte] = {
    val minCode = 2
    val clear = 1 << minCode // 4
    val eoi = clear + 1      // 5
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    emit(clear)
    emit(0) // first literal: prev = 0, no table insert
    // KwKwK chain: emitting the decoder's current nextCode each step
    // inserts one entry and grows the expansion by one byte
    var nextCode = eoi + 1
    while (nextCode < 4096) {
      emit(nextCode)
      nextCode += 1
      if (width < 12 && nextCode == (1 << width)) width += 1
    }
    // table full: decoder stops inserting; every ref to 4095 expands ~4 KB
    var k = 0
    while (k < tailRefs) { emit(4095); k += 1 }
    emit(eoi)
    if (nbits > 0) bits.write((acc & 0xff).toInt)
    val lzw = bits.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { b(v); b(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(8); le16(8) // logical screen 8×8
    b(0x80)          // GCT present, 2 entries
    b(0); b(0)
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // 2-color table
    b(0x2c); le16(0); le16(0); le16(8); le16(8); b(0) // descriptor 8×8
    b(minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      b(n); out.write(lzw, off, n)
      off += n
    }
    b(0)    // block terminator
    b(0x3b) // trailer
    out.toByteArray
  }

  test("decodePng fails fast on a zlib FDICT header instead of spinning") {
    failAfter(Span(20, Seconds)) {
      assert(PixelCodec.decodePng(fdictPng(4, 4)).isEmpty)
    }
  }

  test("GIF LZW decode is bounded by the frame's pixel budget") {
    val bomb = lzwBombGif(tailRefs = 250000) // ~1 GB expansion if unbounded
    assert(bomb.length < 500 * 1024)
    failAfter(Span(20, Seconds)) {
      val frames = PixelCodec.decodeGifFrames(bomb)
      // the 64 needed pixels decode; the bomb tail is never expanded
      assert(frames.exists(_.nonEmpty))
      val img = frames.get.head.image
      assert(img.width === 8 && img.height === 8)
    }
  }

  test("normal PNG and GIF decode still round-trip after the bounds") {
    val rgb = Array.tabulate(6 * 4 * 3)(i => (i * 7 % 251).toByte)
    val img = PixelCodec.RgbImage(6, 4, rgb)
    val decoded = PixelCodec.decodePng(PixelCodec.encodePng(img))
    assert(decoded.exists(d => d.rgb.sameElements(rgb)))

    val palette = Array.tabulate(256 * 3)(i => (i % 256).toByte)
    val idx = Array.tabulate(8 * 8)(i => (i % 251).toByte)
    val gif = PixelCodec.syntheticGif(8, 8, palette, Seq(idx))
    val frames = PixelCodec.decodeGifFrames(gif)
    assert(frames.exists(_.size == 1))
  }

  /** Adam7-interlaced PNG encoder (color type 2, RGB): extracts the
    * seven reduced images, filters each pass row with a rotating filter
    * (hits every unfilter path inside passes), zlib-deflates, real
    * CRCs. Test-local — the production encoder stays non-interlaced.
    */
  private def encodeAdam7(img: PixelCodec.RgbImage): Array[Byte] = {
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def ceilDiv(a: Int, b: Int) = (a + b - 1) / b
    val raw = new java.io.ByteArrayOutputStream()
    for ((px0, py0, dx, dy) <- passes) {
      val pw = math.max(0, ceilDiv(img.width - px0, dx))
      val ph = math.max(0, ceilDiv(img.height - py0, dy))
      if (pw > 0 && ph > 0) {
        val rowBytes = pw * 3
        val prevRow = new Array[Int](rowBytes)
        for (y <- 0 until ph) {
          val cur = new Array[Int](rowBytes)
          for (x <- 0 until pw; c <- 0 until 3)
            cur(3 * x + c) =
              img.rgb(((py0 + y * dy) * img.width + (px0 + x * dx)) * 3 + c) & 0xff
          val ft = (y + pw) % 5
          raw.write(ft)
          for (i <- 0 until rowBytes) {
            val left = if (i >= 3) cur(i - 3) else 0
            val up = prevRow(i)
            val ul = if (i >= 3) prevRow(i - 3) else 0
            val v = cur(i)
            val f = ft match {
              case 0 => v
              case 1 => v - left
              case 2 => v - up
              case 3 => v - ((left + up) >> 1)
              case 4 =>
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                v - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            }
            raw.write(f & 0xff)
          }
          System.arraycopy(cur, 0, prevRow, 0, rowBytes)
        }
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toByteArray); d.finish()
      val buf = new Array[Byte](65536)
      val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) { val n = d.deflate(buf); o.write(buf, 0, n) }
      d.end(); o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def be32(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(data.length)
      val tb = typ.getBytes("US-ASCII"); out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      be32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def ib32(v: Int): Unit = {
      ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ib32(img.width); ib32(img.height)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(1) // interlace 1
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("Adam7 interlaced PNG decodes identically to its non-interlaced twin") {
    // odd dims exercise empty and partial passes; 1x1 hits the
    // one-pixel pass-7-only degenerate case
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 3), (7, 5), (8, 8), (9, 10), (13, 7), (16, 17))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 253).toByte)
      val img = PixelCodec.RgbImage(w, h, rgb)
      val decoded = PixelCodec.decodePng(encodeAdam7(img))
      assert(decoded.exists(d =>
        d.width == w && d.height == h && d.rgb.sameElements(rgb)), s"${w}x$h")
    }
    // truncated interlaced IDAT: None, never a throw
    val full = encodeAdam7(PixelCodec.RgbImage(9, 10, Array.tabulate(270)(_.toByte)))
    assert(PixelCodec.decodePng(full.take(full.length / 2)).isEmpty)
  }
}
