package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Format-correctness gates for the baseline JPEG codec. Two cross-
  * decode directions against the JDK's own ImageIO JPEG codec:
  *
  *  - ImageIO must decode OUR containers BIT-EXACTLY — our encoder
  *    emits only constant (DC-only) blocks with an all-ones quant
  *    table, whose IDCT is exactly integral in any compliant decoder,
  *    so there is no lossy tolerance to hide behind in this direction.
  *  - OUR decoder must read ImageIO-ENCODED JPEGs of arbitrary images
  *    (real nonzero AC coefficients, run-length/EOB symbols, ImageIO's
  *    own huffman + quant tables, non-multiple-of-8 geometry) and agree
  *    with ImageIO's own decode of the same bytes within ±1 — the T.81
  *    IDCT-accuracy expectation for two independent IDCT
  *    implementations; DC-only blocks must agree exactly.
  *
  * A matched encoder/decoder bug pair cannot survive either direction.
  */
class JpegGray8Spec extends AnyFunSuite {

  private def det(seed: Int, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 2654435761L + 1
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 33).toByte
      i += 1
    }
    out
  }

  private def ints(a: org.apache.spark.sql.catalyst.util.ArrayData) =
    a.toIntArray().toSeq

  /** Expected pixels of our constant-block encode: payload byte per
    * 8×8 block, raster block order, zero tail. */
  private def expectedPixels(p: Array[Byte], wb: Int): Seq[Int] = {
    val hb = math.max(1, (p.length + wb - 1) / wb)
    for (y <- 0 until hb * 8; x <- 0 until wb * 8) yield {
      val bi = (y / 8) * wb + (x / 8)
      if (bi < p.length) p(bi) & 0xff else 0
    }
  }

  test("round-trip: decode(encode(payload)) is exact despite a lossy format") {
    for ((n, wb) <- Seq((0, 2), (1, 2), (3, 2), (4, 2), (5, 2),
        (64, 8), (65, 8), (500, 7), (1000, 16))) {
      val p = det(n * 31 + wb, n)
      val jpeg = JpegGray8.encode(p, wb)
      val hb = math.max(1, (n + wb - 1) / wb)
      assert(JpegGray8.width(jpeg) == wb * 8)
      assert(JpegGray8.height(jpeg) == hb * 8)
      assert(ints(JpegGray8.pixels(jpeg)) == expectedPixels(p, wb))
    }
  }

  test("DC categories decoded from the bitstream match the payload differentials") {
    val p = det(7, 40)
    val jpeg = JpegGray8.encode(p, 8)
    val cats = ints(JpegGray8.dcCategories(jpeg))
    var prev = 0
    val expected = p.map { b =>
      val dc = 8 * ((b & 0xff) - 128)
      val diff = dc - prev
      prev = dc
      32 - Integer.numberOfLeadingZeros(math.abs(diff))
    }.toSeq
    assert(cats == expected)
    // the payload spans enough magnitudes that several code lengths ran
    assert(cats.distinct.size >= 3, s"want varied DC categories: $cats")
  }

  test("JDK ImageIO decodes our encoder's output bit-exactly") {
    for (n <- Seq(1, 80, 500)) {
      val p = det(n, n)
      val jpeg = JpegGray8.encode(p, 8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img != null, "ImageIO could not parse our JPEG")
      assert(img.getWidth == 64)
      val expected = expectedPixels(p, 8)
      val theirs = for (y <- 0 until img.getHeight; x <- 0 until 64)
        yield img.getRaster.getSample(x, y, 0)
      assert(theirs == expected,
        s"ImageIO decode diverged from the constant-block image (n=$n)")
    }
  }

  test("restart markers: DRI/RSTn round-trip exactly, DC predictor " +
    "resets per interval, and JDK ImageIO agrees") {
    for ((n, wb, rst) <- Seq((1, 2, 1), (7, 2, 3), (40, 8, 3),
        (64, 8, 8), (65, 8, 5), (500, 7, 11))) {
      val p = det(n * 17 + rst, n)
      val jpeg = JpegGray8.encodeRestart(p, wb, rst)
      // pixels exact through the full resync path
      assert(ints(JpegGray8.pixels(jpeg)) == expectedPixels(p, wb),
        s"restart round-trip diverged (n=$n wb=$wb rst=$rst)")
      // marker count: byte-aligned FFD0-FFD7 occurrences in the stream
      val nRst = (0 until jpeg.length - 1).count(i =>
        (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) >= 0xd0 &&
          (jpeg(i + 1) & 0xff) <= 0xd7)
      val hb = math.max(1, (n + wb - 1) / wb)
      assert(nRst == (wb * hb - 1) / rst,
        s"marker count (n=$n wb=$wb rst=$rst): got $nRst")
      // DC categories reflect the per-interval predictor RESET
      val cats = ints(JpegGray8.dcCategories(jpeg))
      var prev = 0
      val padded = p.map(_ & 0xff).toSeq.padTo(wb * hb, 0)
      val expected = padded.zipWithIndex.map { case (b, i) =>
        val dc = 8 * (b - 128)
        val diff = dc - (if (i % rst == 0) 0 else prev)
        prev = dc
        32 - Integer.numberOfLeadingZeros(math.abs(diff))
      }
      assert(cats == expected,
        s"reset differentials (n=$n wb=$wb rst=$rst)")
      // external validation: the JDK's own codec must read the
      // restart-marked stream and agree pixel-for-pixel
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img != null, "ImageIO could not parse the restart JPEG")
      val theirs = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRaster.getSample(x, y, 0)
      assert(theirs == expectedPixels(p, wb),
        s"ImageIO diverged on the restart stream (n=$n wb=$wb rst=$rst)")
    }
  }

  /** ImageIO-encode a gray image at the given quality; returns jpeg
    * bytes. */
  private def imageIoEncode(px: Array[Int], w: Int, h: Int,
      quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("our decoder reads ImageIO-encoded JPEGs (real AC coefficients) within ±1 of ImageIO's own decode") {
    // gradient + texture + non-multiple-of-8 geometry: nonzero ACs,
    // run-length and EOB symbols, partial edge blocks
    for ((w, h, q) <- Seq((24, 16, 0.95f), (37, 29, 0.85f), (8, 8, 1.0f))) {
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (x * 7 + y * 13 + ((x * y) % 5) * 11) % 256
      }
      val jpeg = imageIoEncode(px, w, h, q)
      assert(JpegGray8.width(jpeg) == w)
      assert(JpegGray8.height(jpeg) == h)
      val ours = ints(JpegGray8.pixels(jpeg))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      val theirs = for (y <- 0 until h; x <- 0 until w)
        yield img.getRaster.getSample(x, y, 0)
      assert(ours.length == theirs.length)
      val maxDiff = ours.zip(theirs).map { case (a, b) =>
        math.abs(a - b) }.max
      assert(maxDiff <= 1,
        s"independent IDCTs diverged by $maxDiff at ${w}x$h q=$q")
    }
  }

  /** Expected RGB stream of our constant-chroma 4:2:0 encode: payload
    * byte per Y quadrant (4 per MCU), image-wide cb/cr. */
  private def expectedRgb(p: Array[Byte], wm: Int, cb: Int,
      cr: Int): Seq[Int] = {
    val hm = math.max(1, (p.length + 4 * wm - 1) / (4 * wm))
    val out = Seq.newBuilder[Int]
    for (y <- 0 until hm * 16; x <- 0 until wm * 16) {
      val mcu = (y / 16) * wm + (x / 16)
      val bi = mcu * 4 + ((y % 16) / 8) * 2 + (x % 16) / 8
      val yy = if (bi < p.length) p(bi) & 0xff else 0
      val (r, g, b) = JpegGray8.ycbcrToRgb(yy, cb, cr)
      out += r; out += g; out += b
    }
    out.result()
  }

  test("4:2:0 color round-trip: interleaved MCUs, dual table sets, " +
    "chroma upsample, YCbCr->RGB — exact") {
    for ((n, wm, cb, cr) <- Seq((0, 1, 128, 128), (1, 1, 90, 200),
        (7, 2, 0, 255), (64, 3, 37, 73), (500, 4, 255, 0))) {
      val p = det(n * 7 + wm, n)
      val jpeg = JpegGray8.encodeYcbcr420(p, wm, cb, cr)
      val hm = math.max(1, (n + 4 * wm - 1) / (4 * wm))
      assert(JpegGray8.width(jpeg) == wm * 16)
      assert(JpegGray8.height(jpeg) == hm * 16)
      assert(ints(JpegGray8.pixelsRgb(jpeg)) == expectedRgb(p, wm, cb, cr))
    }
  }

  test("JDK ImageIO decodes our 4:2:0 color output within ±1 per channel") {
    // constant chroma upsamples to itself under ANY filter (ImageIO's
    // included); the remaining freedom is its fixed-point YCbCr->RGB
    // vs our double matrix — ±1 per channel
    val p = det(11, 120)
    val jpeg = JpegGray8.encodeYcbcr420(p, 3, 70, 180)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO could not parse our color JPEG")
    assert(img.getWidth == 48 && img.getHeight == 160)
    val ours = ints(JpegGray8.pixelsRgb(jpeg))
    var maxDiff = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val o = (y * img.getWidth + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - ours(o)))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - ours(o + 1)))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - ours(o + 2)))
    }
    assert(maxDiff <= 1, s"ImageIO color decode diverged by $maxDiff")
  }

  test("our decoder reads ImageIO-encoded color JPEGs (subsampled, real " +
    "ACs) close to ImageIO's own decode") {
    // a smooth gradient: chroma varies slowly, so the decoder-defined
    // upsampling filter (ours: replication; ImageIO: interpolating)
    // can differ only by the local gradient step. T.81 pins the IDCT
    // to ±1 but deliberately leaves upsampling open — so this bound is
    // loose where the gray test's is tight.
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 5) % 256
      val g = (y * 7) % 256
      val b = ((x + y) * 3) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    val jpeg = bos.toByteArray
    assert(JpegGray8.width(jpeg) == w && JpegGray8.height(jpeg) == h)
    val ours = ints(JpegGray8.pixelsRgb(jpeg))
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = decoded.getRGB(x, y)
      val o = (y * w + x) * 3
      val ds = Seq(
        math.abs(((rgb >> 16) & 0xff) - ours(o)),
        math.abs(((rgb >> 8) & 0xff) - ours(o + 1)),
        math.abs((rgb & 0xff) - ours(o + 2)))
      sumDiff += ds.sum
      maxDiff = math.max(maxDiff, ds.max)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 2.0,
      s"mean channel diff $meanDiff vs ImageIO — decode chain diverged")
    assert(maxDiff <= 32,
      s"max channel diff $maxDiff — more than upsampling-filter freedom")
  }

  test("malformed containers are rejected with descriptive errors") {
    val good = JpegGray8.encode(det(3, 20), 4)
    def boom(bytes: Array[Byte], want: String): Unit = {
      val e = intercept[IllegalArgumentException](JpegGray8.pixels(bytes))
      assert(e.getMessage.contains(want),
        s"wanted '$want' in '${e.getMessage}'")
    }
    boom(Array[Byte](0, 0, 0, 0), "bad SOI")
    boom(good.take(20), "ran off the container")
    // flip SOF0 to SOF2 (progressive): marker bytes FF C0 → FF C2
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    boom(prog, "progressive")
    // truncate inside the entropy stream
    boom(good.dropRight(10), "truncated")
  }

  test("encode rejects degenerate geometry") {
    intercept[IllegalArgumentException](JpegGray8.encode(det(1, 8), 0))
    intercept[IllegalArgumentException](JpegGray8.encode(det(1, 8), 1 << 14))
  }

  test("geometry bound is strictly below 2^13 blocks: 8191 fits SOF's " +
    "u16, 8192 (= 65536 px, overflows to 0) is rejected") {
    // 8191 blocks wide: the largest geometry whose pixel dimension
    // (65528) still fits the SOF u16 field — encode and re-parse
    val ok = JpegGray8.encode(det(9, 4), 8191)
    assert(JpegGray8.width(ok) == 8191 * 8)
    intercept[IllegalArgumentException](JpegGray8.encode(det(9, 4), 8192))
    // same off-by-one class in the color encoder: 4096 16-px MCUs
    intercept[IllegalArgumentException](
      JpegGray8.encodeYcbcr420(det(9, 4), 4096, 128, 128))
    val okC = JpegGray8.encodeYcbcr420(det(9, 4), 4095, 128, 128)
    assert(JpegGray8.width(okC) == 4095 * 16)
  }

  test("rstCount scans only the entropy segment: immune to a SOF " +
    "height that encodes 0xFFD0 (the whole-container scan's trap)") {
    // wb=4, 32741-byte payload → hb = 8186 → height 65488 = 0xFFD0:
    // the SOF dimension bytes form a fake 'RST0' pair in the header
    val n = 32741; val wb = 4; val rst = 3
    val p = det(77, n)
    val jpeg = JpegGray8.encodeRestart(p, wb, rst)
    assert(JpegGray8.height(jpeg) == 65488)
    val hb = math.max(1, (n + wb - 1) / wb)
    val analytic = (wb * hb - 1) / rst
    assert(JpegGray8.rstCount(jpeg) == analytic,
      "entropy-segment marker count must match the analytic count")
    // the naive whole-container byte-pair scan DOES false-positive
    // here (the SOF height bytes), which is exactly why rstCount walks
    // the header instead
    val naive = (0 until jpeg.length - 1).count(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) >= 0xd0 &&
        (jpeg(i + 1) & 0xff) <= 0xd7)
    assert(naive == analytic + 1, "expected exactly one header false hit")
  }

  test("rstCount agrees with the naive scan when no header u16 fakes " +
    "a marker") {
    for ((n, wb, rst) <- Seq((7, 2, 3), (40, 8, 3), (500, 7, 11))) {
      val jpeg = JpegGray8.encodeRestart(det(n, n), wb, rst)
      val hb = math.max(1, (n + wb - 1) / wb)
      assert(JpegGray8.rstCount(jpeg) == (wb * hb - 1) / rst)
    }
    // and zero for a classic single-segment scan
    assert(JpegGray8.rstCount(JpegGray8.encode(det(3, 64), 8)) == 0)
  }
}
