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
}
