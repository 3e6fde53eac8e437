package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec validation. The oracle is the JDK's own
  * `javax.imageio` JPEG codec (a fully independent implementation):
  * our encoder's streams must decode there, and on the same bytes the
  * two decoders must agree to IDCT/color-rounding tolerance. 4:2:0
  * cross-checks use neutral-chroma content so upsampling-filter
  * differences (nearest here, triangular in other decoders) cannot
  * contribute.
  */
class JpegCodecSpec extends AnyFunSuite {
  System.setProperty("java.awt.headless", "true")
  import PixelCodec.RgbImage

  /** Smooth deterministic RGB test card (gradients + a soft disc). */
  private def testCard(w: Int, h: Int): RgbImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val d = math.hypot(x - w / 2.0, y - h / 2.0)
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
      rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      rgb(o + 2) = math.max(0, 220 - d * 4).toInt.toByte
    }
    RgbImage(w, h, rgb)
  }

  /** Neutral-chroma card: R=G=B gradient ⇒ Cb=Cr=128 everywhere. */
  private def grayCard(w: Int, h: Int): RgbImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val g = ((x * 7 + y * 13) % 200 + 20).toByte
      rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
    }
    RgbImage(w, h, rgb)
  }

  private def imageIoDecode(bytes: Array[Byte]): RgbImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the stream")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val gray = img.getRaster.getNumBands == 1
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (gray) {
        // raw raster sample: getRGB would run the gray samples through
        // sRGB color management and skew the comparison
        val g = img.getRaster.getSample(x, y, 0).toByte
        rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
      } else {
        val p = img.getRGB(x, y)
        rgb(o) = ((p >> 16) & 0xff).toByte
        rgb(o + 1) = ((p >> 8) & 0xff).toByte
        rgb(o + 2) = (p & 0xff).toByte
      }
    }
    RgbImage(w, h, rgb)
  }

  private def imageIoEncode(img: RgbImage, quality: Float,
      progressive: Boolean = false, gray: Boolean = false): Array[Byte] = {
    val typ = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val bi = new java.awt.image.BufferedImage(img.width, img.height, typ)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val o = (y * img.width + x) * 3
      if (gray)
        // raw raster write: setRGB on TYPE_BYTE_GRAY would color-manage
        // the value and the JPEG would carry different samples
        bi.getRaster.setSample(x, y, 0, img.rgb(o) & 0xff)
      else
        bi.setRGB(x, y, ((img.rgb(o) & 0xff) << 16) |
          ((img.rgb(o + 1) & 0xff) << 8) | (img.rgb(o + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive) param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  private def maxMeanDiff(a: RgbImage, b: RgbImage): (Int, Double) = {
    assert(a.width == b.width && a.height == b.height)
    var worst = 0; var sum = 0L
    for (i <- a.rgb.indices) {
      val d = math.abs((a.rgb(i) & 0xff) - (b.rgb(i) & 0xff))
      worst = math.max(worst, d); sum += d
    }
    (worst, sum.toDouble / a.rgb.length)
  }

  test("round-trip: our encoder → our decoder stays close to the source (4:4:4 and 4:2:0)") {
    for ((w, h) <- Seq((16, 16), (33, 17), (64, 48), (7, 5))) {
      val img = testCard(w, h)
      val dec444 = JpegCodec.decode(JpegCodec.encode(img, quality = 95)).get
      val (worst444, mean444) = maxMeanDiff(img, dec444)
      assert(worst444 <= 24 && mean444 <= 3.0, s"4:4:4 ${w}x$h worst=$worst444 mean=$mean444")

      val dec420 = JpegCodec.decode(JpegCodec.encode(img, quality = 95, subsample420 = true)).get
      val (_, mean420) = maxMeanDiff(img, dec420)
      // chroma halved: looser mean; a tiny card (7x5) is dominated by
      // its steep per-pixel chroma gradient, which half-res chroma
      // genuinely cannot carry — that's the format, not the codec
      if (w >= 16 && h >= 16)
        assert(mean420 <= 6.0, s"4:2:0 ${w}x$h mean=$mean420")
    }
  }

  test("our encoder's streams decode in the JDK's ImageIO codec, matching our decoder") {
    // 4:4:4: no upsampling ambiguity — both decoders see the same
    // samples; differences are IDCT/color rounding only
    val img = testCard(40, 24)
    val enc = JpegCodec.encode(img, quality = 90)
    val ours = JpegCodec.decode(enc).get
    val theirs = imageIoDecode(enc)
    val (worst, mean) = maxMeanDiff(ours, theirs)
    assert(worst <= 4 && mean <= 1.0, s"4:4:4 decoder parity worst=$worst mean=$mean")

    // 4:2:0 with neutral chroma: upsampling filters can't differ on a
    // constant chroma plane
    val gimg = grayCard(34, 26)
    val enc420 = JpegCodec.encode(gimg, quality = 90, subsample420 = true)
    val (worst420, mean420) = maxMeanDiff(JpegCodec.decode(enc420).get, imageIoDecode(enc420))
    assert(worst420 <= 4 && mean420 <= 1.0, s"4:2:0 parity worst=$worst420 mean=$mean420")
  }

  test("foreign streams: ImageIO-encoded color and grayscale JPEGs decode to parity") {
    // a bitstream we did NOT produce: different quant/Huffman choices,
    // JFIF written by the JDK encoder
    val gimg = grayCard(48, 32)
    val foreignGray = imageIoEncode(gimg, 0.9f, gray = true)
    val oursG = JpegCodec.decode(foreignGray)
    assert(oursG.isDefined, "1-component baseline stream must decode")
    val (worstG, meanG) = maxMeanDiff(oursG.get, imageIoDecode(foreignGray))
    assert(worstG <= 4 && meanG <= 1.0, s"grayscale parity worst=$worstG mean=$meanG")

    // color: neutral-chroma content so the writer's subsampling choice
    // can't make upsampling filters diverge
    val foreignColor = imageIoEncode(gimg, 0.9f)
    val oursC = JpegCodec.decode(foreignColor)
    assert(oursC.isDefined, "3-component baseline stream must decode")
    val (worstC, meanC) = maxMeanDiff(oursC.get, imageIoDecode(foreignColor))
    assert(worstC <= 6 && meanC <= 1.5, s"color parity worst=$worstC mean=$meanC")
  }

  test("restart markers: DRI/RSTn streams decode identically in both decoders") {
    val img = testCard(64, 40)
    val enc = JpegCodec.encode(img, quality = 88, subsample420 = true, restartInterval = 3)
    assert(enc.containsSlice(Array(0xff.toByte, 0xdd.toByte)), "DRI emitted")
    assert(enc.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7), "RSTn emitted")
    val ours = JpegCodec.decode(enc)
    assert(ours.isDefined, "restart-interval stream must decode")
    // ImageIO agrees the stream is valid and on luma content (the test
    // card is smooth) stays within decoder tolerance
    val theirs = imageIoDecode(enc)
    val (_, mean) = maxMeanDiff(ours.get, theirs)
    assert(mean <= 2.5, s"restart stream parity mean=$mean")
  }

  test("progressive (SOF2) foreign streams decode to parity with ImageIO") {
    // neutral-chroma content: subsampling-filter differences can't
    // contribute; the stream is a REAL multi-scan progressive JPEG
    // (spectral selection + successive approximation) produced by an
    // independent encoder
    for ((w, h) <- Seq((24, 24), (41, 23), (64, 48))) {
      val img = grayCard(w, h)
      val progressive = imageIoEncode(img, 0.85f, progressive = true)
      // really SOF2 on the wire, not a sequential fallback
      assert(progressive.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "stream must be SOF2")
      val ours = JpegCodec.decode(progressive)
      assert(ours.isDefined, s"progressive ${w}x$h must decode")
      val (worst, mean) = maxMeanDiff(ours.get, imageIoDecode(progressive))
      assert(worst <= 6 && mean <= 1.5, s"progressive parity ${w}x$h worst=$worst mean=$mean")
    }
    // color progressive: same bound as the color sequential case
    val cimg = grayCard(32, 32)
    val colorProg = imageIoEncode(cimg, 0.85f, progressive = true)
    val oursC = JpegCodec.decode(colorProg)
    assert(oursC.isDefined, "color progressive must decode")
    val (worstC, meanC) = maxMeanDiff(oursC.get, imageIoDecode(colorProg))
    assert(worstC <= 6 && meanC <= 1.5, s"color progressive parity worst=$worstC mean=$meanC")
    // truncated progressive: None, never a throw
    assert(JpegCodec.decode(colorProg.take(colorProg.length / 2)).isEmpty)
  }

  test("unsupported profiles and malformed streams: None, never a throw") {
    val img = grayCard(24, 24)
    val good = JpegCodec.encode(img, quality = 80)
    // truncation at every interesting boundary
    for (cut <- Seq(2, 4, 20, good.length / 4, good.length / 2, good.length - 3))
      assert(JpegCodec.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    // bit flips across the stream must never throw (decode may still
    // succeed when the flip lands in an ignorable byte)
    for (pos <- 2 until good.length by 37) {
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ 0x55).toByte
      JpegCodec.decode(bad) // must not throw
    }
    assert(JpegCodec.decode("garbage".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("decodeImage dispatches JPEG: features/resize pipelines see real pixels") {
    val img = testCard(32, 32)
    val viaDispatch = PixelCodec.decodeImage(JpegCodec.encode(img, quality = 92))
    assert(viaDispatch.isDefined)
    val (_, mean) = maxMeanDiff(img, viaDispatch.get)
    assert(mean <= 3.0)
  }
}
