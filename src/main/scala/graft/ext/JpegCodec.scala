package graft.ext

/** Baseline JPEG (ITU-T T.81) entropy codec in pure JDK — the last
  * piece of the multimodal stack that was a stated stub. Everything
  * here is public-spec knowledge: Annex K tables, canonical Huffman
  * construction (F.2.2.3), zigzag order, the FDCT/IDCT definitions of
  * §A.3.3, JFIF YCbCr conversion.
  *
  * Decode: DQT/DHT/SOF/DRI/SOS segment walk, byte-stuffed entropy
  * scan (DC prediction + AC run-length), dequantize + dezigzag,
  * separable double-precision IDCT, restart markers, any h/v sampling
  * ≤ 4 (nearest-neighbor chroma upsampling), 3-component YCbCr and
  * 1-component grayscale — for both SEQUENTIAL (SOF0/1) and
  * PROGRESSIVE (SOF2: spectral-selection bands, EOB runs,
  * successive-approximation DC/AC refinement, T.81 G.1.2) streams.
  * Lossless, arithmetic and 12-bit streams return None — callers keep
  * their stated fallback. Never throws on malformed input; all
  * allocations are bounded by [[PixelCodec.MaxPixels]].
  *
  * Encode: standard Annex K quantization tables scaled by the public
  * libjpeg quality formula, Annex K.3 Huffman tables (written to the
  * stream, so any conformant decoder reads them back), 4:4:4 or 4:2:0
  * subsampling, optional restart intervals. Output decodes in any JPEG
  * reader — the spec cross-validates against the JDK's own `javax
  * .imageio` codec.
  *
  * Reference anchor: the reference pipeline treats media payloads as
  * opaque bytes (pkg/models — events carry CIDs, not pixels); this
  * codec exists for the training-data side of the engine, where
  * image decode is a first-class corpus operation.
  */
object JpegCodec {
  import PixelCodec.{MaxPixels, RgbImage}

  // zigzag scan position -> natural (row-major) index, T.81 Figure 5
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // bail-out for malformed input: no stack trace (hot path), caught at
  // the decode() boundary only
  private object Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Bail

  private def dimsSane(w: Int, h: Int): Boolean =
    w > 0 && h > 0 && w.toLong * h <= MaxPixels

  // ------------------------------------------------------------ bits in

  /** Entropy-scan bit reader with FF00 byte-unstuffing. Hitting a real
    * marker mid-symbol (truncated scan) bails; restart markers are
    * consumed explicitly at MCU-row boundaries via [[restart]].
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) fail()
        val b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) fail()
          if ((data(pos) & 0xff) == 0) pos += 1 // stuffed FF
          else fail() // marker inside a symbol: truncated / corrupt scan
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTm marker. */
    def restart(expectM: Int): Unit = {
      cnt = 0
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff) fail()
      var p = pos + 1
      while (p < data.length && (data(p) & 0xff) == 0xff) p += 1 // fill bytes
      if (p >= data.length || (data(p) & 0xff) != (0xd0 + expectM)) fail()
      pos = p + 1
    }
  }

  /** Canonical Huffman decode tables (T.81 F.2.2.3: MINCODE / MAXCODE /
    * VALPTR per code length).
    */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var p = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxcode(l) = -1
        else {
          valptr(l) = p
          mincode(l) = code
          code += bits(l - 1); p += bits(l - 1)
          maxcode(l) = code - 1
          if (code > (1 << l)) fail() // over-subscribed: not a prefix code
        }
        code <<= 1
        l += 1
      }
      if (p != vals.length) fail()
    }
    def decode(br: BitReader): Int = {
      var code = br.bit(); var l = 1
      while (code > maxcode(l)) {
        l += 1
        if (l > 16) fail()
        code = (code << 1) | br.bit()
      }
      val idx = valptr(l) + code - mincode(l)
      if (idx < 0 || idx >= vals.length) fail()
      vals(idx) & 0xff
    }
  }

  private final class Comp(val id: Int, val hi: Int, val vi: Int, val tq: Int) {
    var td, ta = 0
    var pred = 0
    var pw, ph = 0
    var plane: Array[Byte] = null
    var q: Array[Int] = null
    var dc, ac: HuffDecoder = null
    // progressive state: the full coefficient plane (zigzag index order
    // per block), MCU-padded grid plus the actual (non-padded) block
    // counts that non-interleaved scans cover
    var coefs: Array[Short] = null
    var blocksW, blocksH = 0 // padded to whole MCUs
    var bw, bh = 0 // ceil(componentSamples / 8): non-interleaved scan extent
  }

  // ------------------------------------------------------------- (I)DCT

  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** 2-D IDCT (A.3.3), separable: horizontal pass into `tmp`, vertical
    * into `out`. Natural layout: F(u,v) at v*8+u.
    */
  private def idct(in: Array[Double], tmp: Array[Double], out: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += Cu(u) * in(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = acc / 2.0
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var vv = 0
        while (vv < 8) { acc += Cu(vv) * tmp(vv * 8 + x) * Cos(y)(vv); vv += 1 }
        out(y * 8 + x) = acc / 2.0
        x += 1
      }
      y += 1
    }
  }

  /** Forward DCT, same separable structure. Input s(x,y) at y*8+x. */
  private def fdct(in: Array[Double], tmp: Array[Double], out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0; var x = 0
        while (x < 8) { acc += in(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = acc * Cu(u) / 2.0
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0; var yy = 0
        while (yy < 8) { acc += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = acc * Cu(v) / 2.0
        u += 1
      }
      v += 1
    }
  }

  // ------------------------------------------------------------- decode

  /** Baseline or progressive JPEG → RGB; None on anything the profile
    * doesn't cover or any malformed stream — never a throw.
    */
  def decode(bytes: Array[Byte]): Option[RgbImage] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    try decodeImpl(bytes)
    catch { case Bail | _: ArrayIndexOutOfBoundsException => None }
  }

  private def extend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def decodeImpl(bytes: Array[Byte]): Option[RgbImage] = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = u8(i) << 8 | u8(i + 1)

    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var progressive = false
    var progSosAt = -1 // marker-byte index of the first SOS (progressive path)
    var scanStart = -1
    var i = 2
    while (scanStart < 0) {
      if (i + 1 >= bytes.length) fail()
      if (u8(i) != 0xff) fail()
      var m = i + 1
      while (u8(m) == 0xff) { m += 1; if (m >= bytes.length) fail() }
      val marker = u8(m)
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = m + 1 // TEM/RSTn: no payload
      else if (marker == 0xd9) fail() // EOI before any scan
      else {
        if (m + 2 >= bytes.length) fail()
        val segLen = be16(m + 1)
        if (segLen < 2 || m + 1 + segLen > bytes.length) fail()
        val ds = m + 3
        val de = m + 1 + segLen
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = ds
            while (p < de) {
              val pq = u8(p) >> 4; val tq = u8(p) & 15
              if (pq > 1 || tq > 3) fail()
              val step = if (pq == 1) 2 else 1
              if (p + 1 + 64 * step > de) fail()
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(k) = if (pq == 1) be16(p + 1 + 2 * k) else u8(p + 1 + k)
                if (tab(k) == 0) fail()
                k += 1
              }
              quant(tq) = tab
              p += 1 + 64 * step
            }
          case 0xc4 => // DHT: one or more tables
            var p = ds
            while (p < de) {
              if (p + 17 > de) fail()
              val tc = u8(p) >> 4; val th = u8(p) & 15
              if (tc > 1 || th > 3) fail()
              val bits = Array.tabulate(16)(k => u8(p + 1 + k))
              val n = bits.sum
              if (n > 256 || p + 17 + n > de) fail()
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              if (tc == 0) dcTabs(th) = new HuffDecoder(bits, vals)
              else acTabs(th) = new HuffDecoder(bits, vals)
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // baseline / ext. sequential / progressive (Huffman)
            if (de - ds < 6 || u8(ds) != 8) return None // 12-bit precision unsupported
            progressive = marker == 0xc2
            h = be16(ds + 1); w = be16(ds + 3)
            val nc = u8(ds + 5)
            if ((nc != 1 && nc != 3) || !dimsSane(w, h) || de - ds < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val o = ds + 6 + 3 * c
              new Comp(u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
            }
            comps.foreach { c =>
              if (c.hi < 1 || c.hi > 4 || c.vi < 1 || c.vi > 4 || c.tq > 3) fail()
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / differential / arithmetic
          case 0xdd =>
            if (de - ds < 2) fail()
            restartInterval = be16(ds)
          case 0xda =>
            if (comps == null) fail()
            if (progressive) { progSosAt = m; scanStart = de } // multi-scan path below
            else {
              // baseline: one interleaved scan covering every component
              val ns = u8(ds)
              if (ns != comps.length || de - ds < 1 + 2 * ns + 3) return None
              var s = 0
              while (s < ns) {
                val cid = u8(ds + 1 + 2 * s); val tt = u8(ds + 2 + 2 * s)
                val comp = comps.find(_.id == cid).getOrElse(fail())
                comp.td = tt >> 4; comp.ta = tt & 15
                if (comp.td > 3 || comp.ta > 3) fail()
                s += 1
              }
              scanStart = de
            }
          case _ => // APPn / COM / DNL etc: skip
        }
        i = m + 1 + segLen
      }
    }
    if (progressive)
      return decodeProgressive(bytes, progSosAt, quant, dcTabs, acTabs,
        restartInterval, w, h, comps)

    val hmax = comps.map(_.hi).max
    val vmax = comps.map(_.vi).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.pw = mcusX * c.hi * 8
      c.ph = mcusY * c.vi * 8
      // padded planes stay within a constant factor of the pixel budget
      if (c.pw.toLong * c.ph > 4L * MaxPixels) fail()
      c.plane = new Array[Byte](c.pw * c.ph)
      c.q = quant(c.tq); if (c.q == null) fail()
      c.dc = dcTabs(c.td); c.ac = acTabs(c.ta)
      if (c.dc == null || c.ac == null) fail()
      c.pred = 0
    }

    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val pix = new Array[Double](64)
    var rstExpect = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstExpect)
          rstExpect = (rstExpect + 1) & 7
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.vi) {
            var bx = 0
            while (bx < c.hi) {
              // one 8x8 block: DC diff + AC run-length, dequantized in
              // natural order (q tables arrive in zigzag order like the
              // coefficients, F.2.1.5)
              java.util.Arrays.fill(coef, 0.0)
              val t = c.dc.decode(br)
              if (t > 15) fail()
              val diff = if (t == 0) 0 else extend(br.receive(t), t)
              c.pred += diff
              coef(0) = c.pred.toDouble * c.q(0)
              var k = 1
              while (k < 64) {
                val rs = c.ac.decode(br)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) { if (r == 15) k += 16 else k = 64 } // ZRL / EOB
                else {
                  k += r
                  if (k > 63) fail()
                  coef(ZigZag(k)) = extend(br.receive(s), s).toDouble * c.q(k)
                  k += 1
                }
              }
              idct(coef, tmp, pix)
              val ox = (mx * c.hi + bx) * 8
              val oy = (my * c.vi + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val vD = pix(yy * 8 + xx) + 128.5 // level shift + round
                  val v = if (vD < 0) 0 else if (vD > 255) 255 else vD.toInt
                  c.plane((oy + yy) * c.pw + ox + xx) = v.toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    Some(colorConvert(comps, w, h, hmax, vmax))
  }

  /** Progressive JPEG (SOF2) decode: the scans after the first SOS are
    * processed in sequence (T.81 G.1.2 — DC first/refine, AC spectral
    * bands with EOB runs, successive-approximation refinement), each
    * accumulating into full per-component coefficient planes; at EOI
    * everything dequantizes and IDCTs once. `firstSosMarker` is the
    * marker-byte index of the first SOS; DHT/DQT/DRI may be redefined
    * between scans and are honored per scan.
    */
  private def decodeProgressive(
      bytes: Array[Byte], firstSosMarker: Int,
      quant: Array[Array[Int]], dcTabs: Array[HuffDecoder], acTabs: Array[HuffDecoder],
      ri0: Int, w: Int, h: Int, comps: Array[Comp]): Option[RgbImage] = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = u8(i) << 8 | u8(i + 1)

    val hmax = comps.map(_.hi).max
    val vmax = comps.map(_.vi).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.blocksW = mcusX * c.hi
      c.blocksH = mcusY * c.vi
      if (c.blocksW.toLong * c.blocksH * 64 > 4L * MaxPixels) fail()
      c.coefs = new Array[Short](c.blocksW * c.blocksH * 64)
      // non-interleaved scans cover only the component's true extent
      c.bw = ((w * c.hi + hmax - 1) / hmax + 7) / 8
      c.bh = ((h * c.vi + vmax - 1) / vmax + 7) / 8
    }

    var restartInterval = ri0
    var sawScan = false
    var done = false
    var i = firstSosMarker - 1 // the SOS marker's leading 0xFF
    while (!done) {
      if (i + 1 >= bytes.length) fail()
      if (u8(i) != 0xff) fail()
      var m = i + 1
      while (u8(m) == 0xff) { m += 1; if (m >= bytes.length) fail() }
      val marker = u8(m)
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = m + 1
      else if (marker == 0xd9) done = true // EOI
      else {
        if (m + 2 >= bytes.length) fail()
        val segLen = be16(m + 1)
        if (segLen < 2 || m + 1 + segLen > bytes.length) fail()
        val ds = m + 3
        val de = m + 1 + segLen
        marker match {
          case 0xdb =>
            var p = ds
            while (p < de) {
              val pq = u8(p) >> 4; val tq = u8(p) & 15
              if (pq > 1 || tq > 3) fail()
              val step = if (pq == 1) 2 else 1
              if (p + 1 + 64 * step > de) fail()
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(k) = if (pq == 1) be16(p + 1 + 2 * k) else u8(p + 1 + k)
                if (tab(k) == 0) fail()
                k += 1
              }
              quant(tq) = tab
              p += 1 + 64 * step
            }
            i = m + 1 + segLen
          case 0xc4 =>
            var p = ds
            while (p < de) {
              if (p + 17 > de) fail()
              val tc = u8(p) >> 4; val th = u8(p) & 15
              if (tc > 1 || th > 3) fail()
              val bits = Array.tabulate(16)(k => u8(p + 1 + k))
              val n = bits.sum
              if (n > 256 || p + 17 + n > de) fail()
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              if (tc == 0) dcTabs(th) = new HuffDecoder(bits, vals)
              else acTabs(th) = new HuffDecoder(bits, vals)
              p += 17 + n
            }
            i = m + 1 + segLen
          case 0xdd =>
            if (de - ds < 2) fail()
            restartInterval = be16(ds)
            i = m + 1 + segLen
          case 0xda =>
            val ns = u8(ds)
            if (ns < 1 || ns > comps.length || de - ds < 1 + 2 * ns + 3) fail()
            val scomps = Array.tabulate(ns) { s =>
              comps.find(_.id == u8(ds + 1 + 2 * s)).getOrElse(fail())
            }
            var s = 0
            while (s < ns) {
              val tt = u8(ds + 2 + 2 * s)
              scomps(s).td = tt >> 4; scomps(s).ta = tt & 15
              if (scomps(s).td > 3 || scomps(s).ta > 3) fail()
              scomps(s).dc = dcTabs(scomps(s).td)
              scomps(s).ac = acTabs(scomps(s).ta)
              s += 1
            }
            val ss = u8(de - 3); val se = u8(de - 2)
            val ah = u8(de - 1) >> 4; val al = u8(de - 1) & 15
            if (ss > 63 || se > 63 || ss > se || ah > 13 || al > 13) fail()
            if (ss == 0 && se != 0) fail() // DC scans carry only k=0
            if (ss > 0 && ns != 1) fail() // AC scans are single-component
            i = runScan(bytes, de, scomps, ss, se, ah, al,
              restartInterval, mcusX, mcusY)
            sawScan = true
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            fail() // a second frame is out of scope
          case _ =>
            i = m + 1 + segLen // APPn / COM etc
        }
      }
    }
    if (!sawScan) fail()

    // reconstruct: dequantize + dezigzag + IDCT every (padded) block
    val coefN = new Array[Double](64)
    val tmp = new Array[Double](64)
    val pix = new Array[Double](64)
    comps.foreach { c =>
      c.pw = c.blocksW * 8
      c.ph = c.blocksH * 8
      c.plane = new Array[Byte](c.pw * c.ph)
      val q = quant(c.tq); if (q == null) fail()
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val base = (by * c.blocksW + bx) * 64
          var k = 0
          while (k < 64) { coefN(ZigZag(k)) = c.coefs(base + k).toDouble * q(k); k += 1 }
          idct(coefN, tmp, pix)
          val ox = bx * 8; val oy = by * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val vD = pix(yy * 8 + xx) + 128.5
              val v = if (vD < 0) 0 else if (vD > 255) 255 else vD.toInt
              c.plane((oy + yy) * c.pw + ox + xx) = v.toByte
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    Some(colorConvert(comps, w, h, hmax, vmax))
  }

  /** One progressive scan (T.81 G.1.2). Returns the index of the next
    * marker's 0xFF after the scan's entropy data.
    */
  private def runScan(bytes: Array[Byte], dataStart: Int, scomps: Array[Comp],
      ss: Int, se: Int, ah: Int, al: Int, ri: Int, mcusX: Int, mcusY: Int): Int = {
    val br = new BitReader(bytes, dataStart)
    var eobrun = 0
    scomps.foreach(_.pred = 0)
    val isDc = ss == 0
    val p1 = 1 << al
    val m1 = -1 << al

    def dcFirst(c: Comp, base: Int): Unit = {
      if (c.dc == null) fail()
      val t = c.dc.decode(br)
      if (t > 15) fail()
      val diff = if (t == 0) 0 else extend(br.receive(t), t)
      c.pred += diff
      c.coefs(base) = (c.pred << al).toShort
    }
    def dcRefine(c: Comp, base: Int): Unit =
      if (br.bit() == 1) c.coefs(base) = (c.coefs(base) | p1).toShort

    def acFirst(c: Comp, base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      if (c.ac == null) fail()
      var k = ss
      var ended = false
      while (k <= se && !ended) {
        val rs = c.ac.decode(br)
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            ended = true
          }
        } else {
          k += r
          if (k > se) fail()
          c.coefs(base + k) = (extend(br.receive(s), s) << al).toShort
          k += 1
        }
      }
    }

    def acRefine(c: Comp, base: Int): Unit = {
      if (c.ac == null) fail()
      def refineAt(idx: Int): Unit = {
        val cv: Int = c.coefs(idx)
        if (br.bit() == 1 && (cv & p1) == 0)
          c.coefs(idx) = (cv + (if (cv >= 0) p1 else m1)).toShort
      }
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = c.ac.decode(br)
          var r = rs >> 4
          val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) { // EOBn: refine the tail, then the run covers whole blocks
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              ended = true
            } // r == 15 (ZRL): skip 16 zero-history coefficients below
          } else {
            if (s != 1) fail() // refinement only appends ±1 at this bit
            newval = if (br.bit() == 1) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              if (c.coefs(base + k) != 0) refineAt(base + k)
              else {
                if (r == 0) {
                  if (s != 0) c.coefs(base + k) = newval.toShort
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (s != 0 && !placed) fail() // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (c.coefs(base + k) != 0) refineAt(base + k)
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeUnit(c: Comp, base: Int): Unit =
      if (isDc) { if (ah == 0) dcFirst(c, base) else dcRefine(c, base) }
      else { if (ah == 0) acFirst(c, base) else acRefine(c, base) }

    var rstM = 0
    var unit = 0
    def maybeRestart(): Unit =
      if (ri > 0 && unit > 0 && unit % ri == 0) {
        br.restart(rstM)
        rstM = (rstM + 1) & 7
        scomps.foreach(_.pred = 0)
        eobrun = 0
      }

    if (scomps.length > 1) {
      // interleaved DC scan over the padded MCU grid
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var ci = 0
          while (ci < scomps.length) {
            val c = scomps(ci)
            var by = 0
            while (by < c.vi) {
              var bx = 0
              while (bx < c.hi) {
                decodeUnit(c, ((my * c.vi + by) * c.blocksW + (mx * c.hi + bx)) * 64)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: the component's true block extent, one block
      // per restart unit
      val c = scomps(0)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          maybeRestart()
          decodeUnit(c, (by * c.blocksW + bx) * 64)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }

    // locate the next marker (skipping pad bytes and any stray RSTn)
    var p = br.pos
    while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff && {
      val nx = bytes(p + 1) & 0xff
      nx != 0 && (nx < 0xd0 || nx > 0xd7)
    })) p += 1
    if (p + 1 >= bytes.length) fail()
    p
  }

  /** Upsample (nearest) + JFIF YCbCr → RGB over decoded planes. */
  private def colorConvert(comps: Array[Comp], w: Int, h: Int, hmax: Int, vmax: Int): RgbImage = {
    val out = new Array[Byte](w * h * 3)
    def clamp(v: Double): Byte = {
      val i2 = (v + 0.5).toInt
      (if (i2 < 0) 0 else if (i2 > 255) 255 else i2).toByte
    }
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = c.plane(y * c.pw + x)
          val o = (y * w + x) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        val yY = y * cy.vi / vmax; val yB = y * cb.vi / vmax; val yR = y * cr.vi / vmax
        var x = 0
        while (x < w) {
          val yv = cy.plane(yY * cy.pw + x * cy.hi / hmax) & 0xff
          val bv = (cb.plane(yB * cb.pw + x * cb.hi / hmax) & 0xff) - 128
          val rv = (cr.plane(yR * cr.pw + x * cr.hi / hmax) & 0xff) - 128
          val o = (y * w + x) * 3
          out(o) = clamp(yv + 1.402 * rv)
          out(o + 1) = clamp(yv - 0.344136 * bv - 0.714136 * rv)
          out(o + 2) = clamp(yv + 1.772 * bv)
          x += 1
        }
        y += 1
      }
    }
    RgbImage(w, h, out)
  }

  // ------------------------------------------------------------- encode

  // Annex K.1/K.2 quantization tables, natural (row-major) order
  private val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 Huffman specifications (BITS + HUFFVAL)
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array.tabulate(12)(_.toByte)
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array.tabulate(12)(_.toByte)
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical (code, length) assignment for an encode table. */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Byte]) {
    val codes = new Array[Int](256)
    val lens = new Array[Int](256)
    locally {
      var code = 0; var p = 0; var l = 1
      while (l <= 16) {
        var n = bits(l - 1)
        while (n > 0) {
          val sym = vals(p) & 0xff
          codes(sym) = code; lens(sym) = l
          code += 1; p += 1; n -= 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = while (cnt != 0) put(1, 1)
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** RGB → baseline JFIF JPEG. `quality` 1-100 scales the Annex K
    * tables by the public libjpeg formula; `subsample420` emits 2x2
    * chroma subsampling (box-averaged) instead of 4:4:4;
    * `restartInterval` > 0 emits DRI + RSTn markers every that many
    * MCUs (exercises the decoder's restart path and is what a robust
    * encoder ships for error resilience).
    */
  def encode(img: RgbImage, quality: Int = 85, subsample420: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val w = img.width; val h = img.height
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    def scaled(base: Array[Int]): Array[Int] =
      base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
    val qLuma = scaled(QLumaBase)
    val qChroma = scaled(QChromaBase)

    // color convert to full-res planes
    val yP = new Array[Double](w * h)
    val bP = new Array[Double](w * h)
    val rP = new Array[Double](w * h)
    var p = 0
    while (p < w * h) {
      val r = img.rgb(3 * p) & 0xff
      val g = img.rgb(3 * p + 1) & 0xff
      val b = img.rgb(3 * p + 2) & 0xff
      yP(p) = 0.299 * r + 0.587 * g + 0.114 * b
      bP(p) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      rP(p) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      p += 1
    }
    // chroma planes at their sampled resolution (box average for 4:2:0)
    val (cw, ch) = if (subsample420) ((w + 1) / 2, (h + 1) / 2) else (w, h)
    def downsample(src: Array[Double]): Array[Double] =
      if (!subsample420) src
      else Array.tabulate(cw * ch) { i =>
        val cx = i % cw; val cy = i / cw
        var acc = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sx = 2 * cx + dx; val sy = 2 * cy + dy
            if (sx < w && sy < h) { acc += src(sy * w + sx); n += 1 }
            dx += 1
          }
          dy += 1
        }
        acc / n
      }
    val bS = downsample(bP)
    val rS = downsample(rP)

    val out = new java.io.ByteArrayOutputStream()
    def b8(v: Int): Unit = out.write(v & 0xff)
    def b16(v: Int): Unit = { b8(v >> 8); b8(v) }
    def marker(m: Int): Unit = { b8(0xff); b8(m) }
    marker(0xd8) // SOI
    marker(0xe0); b16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); b8(0)
    b8(1); b8(1); b8(0); b16(1); b16(1); b8(0); b8(0)
    // DQT (both tables, 8-bit precision, zigzag order)
    marker(0xdb); b16(2 + 2 * 65)
    b8(0x00); var k = 0; while (k < 64) { b8(qLuma(ZigZag(k))); k += 1 }
    b8(0x01); k = 0; while (k < 64) { b8(qChroma(ZigZag(k))); k += 1 }
    // SOF0
    marker(0xc0); b16(8 + 3 * 3); b8(8); b16(h); b16(w); b8(3)
    val samp = if (subsample420) 0x22 else 0x11
    b8(1); b8(samp); b8(0) // Y
    b8(2); b8(0x11); b8(1) // Cb
    b8(3); b8(0x11); b8(1) // Cr
    // DHT (all four Annex K tables)
    def dht(tcth: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); b16(2 + 17 + vals.length); b8(tcth)
      bits.foreach(b8); out.write(vals, 0, vals.length)
    }
    dht(0x00, DcLumaBits, DcLumaVals)
    dht(0x10, AcLumaBits, AcLumaVals)
    dht(0x01, DcChromaBits, DcChromaVals)
    dht(0x11, AcChromaBits, AcChromaVals)
    if (restartInterval > 0) { marker(0xdd); b16(2 + 2); b16(restartInterval) }
    // SOS
    marker(0xda); b16(6 + 2 * 3); b8(3)
    b8(1); b8(0x00); b8(2); b8(0x11); b8(3); b8(0x11)
    b8(0); b8(63); b8(0) // Ss/Se/AhAl

    val dcL = new HuffEncoder(DcLumaBits, DcLumaVals)
    val acL = new HuffEncoder(AcLumaBits, AcLumaVals)
    val dcC = new HuffEncoder(DcChromaBits, DcChromaVals)
    val acC = new HuffEncoder(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val freq = new Array[Double](64)
    val qz = new Array[Int](64)

    def encodeBlock(plane: Array[Double], pw: Int, ph: Int, ox: Int, oy: Int,
        q: Array[Int], dcT: HuffEncoder, acT: HuffEncoder, pred: Int): Int = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          // edge replication for partial blocks
          val sx = math.min(ox + x, pw - 1)
          val sy = math.min(oy + y, ph - 1)
          block(y * 8 + x) = plane(sy * pw + sx) - 128.0
          x += 1
        }
        y += 1
      }
      fdct(block, tmp, freq)
      var kk = 0
      while (kk < 64) {
        val nat = ZigZag(kk)
        qz(kk) = math.round(freq(nat) / q(nat)).toInt
        kk += 1
      }
      val dc = qz(0)
      val diff = dc - pred
      val t = category(diff)
      bw.put(dcT.codes(t), dcT.lens(t))
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      var run = 0
      var kAc = 1
      while (kAc < 64) {
        val v = qz(kAc)
        if (v == 0) run += 1
        else {
          while (run >= 16) { bw.put(acT.codes(0xf0), acT.lens(0xf0)); run -= 16 } // ZRL
          val s = category(v)
          val rs = (run << 4) | s
          bw.put(acT.codes(rs), acT.lens(rs))
          bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
          run = 0
        }
        kAc += 1
      }
      if (run > 0) bw.put(acT.codes(0x00), acT.lens(0x00)) // EOB
      dc
    }

    val hmax = if (subsample420) 2 else 1
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * hmax - 1) / (8 * hmax)
    var predY, predB, predR = 0
    var rstM = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flushWithOnes()
          marker(0xd0 + rstM)
          rstM = (rstM + 1) & 7
          predY = 0; predB = 0; predR = 0
        }
        if (subsample420) {
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              predY = encodeBlock(yP, w, h, (2 * mx + bx) * 8, (2 * my + by) * 8,
                qLuma, dcL, acL, predY)
              bx += 1
            }
            by += 1
          }
          predB = encodeBlock(bS, cw, ch, mx * 8, my * 8, qChroma, dcC, acC, predB)
          predR = encodeBlock(rS, cw, ch, mx * 8, my * 8, qChroma, dcC, acC, predR)
        } else {
          predY = encodeBlock(yP, w, h, mx * 8, my * 8, qLuma, dcL, acL, predY)
          predB = encodeBlock(bS, w, h, mx * 8, my * 8, qChroma, dcC, acC, predB)
          predR = encodeBlock(rS, w, h, mx * 8, my * 8, qChroma, dcC, acC, predR)
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
