package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Format-correctness gates for the PNG gray8 codec. The decisive tests
  * cross-decode against the JDK's own ImageIO PNG codec in BOTH
  * directions — our encoder must be readable by a codec we didn't
  * write, and our decoder must read a stream we didn't produce (ImageIO
  * picks its own filters and compression, so this exercises decode
  * paths independent of our encoder's row%5 policy). A matched
  * encoder/decoder bug pair cannot survive either direction. */
class PngGray8Spec extends AnyFunSuite {

  private def det(seed: Int, n: Int): Array[Byte] = {
    // deterministic pseudo-random payload (no Random: repeatability)
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

  test("round-trip: decode(encode(payload)) == payload + zero tail") {
    for ((n, w) <- Seq((0, 16), (1, 16), (15, 16), (16, 16), (17, 16),
        (160, 16), (161, 16), (1000, 7), (4096, 64))) {
      val p = det(n * 31 + w, n)
      val png = PngGray8.encode(p, w)
      val h = math.max(1, (n + w - 1) / w)
      assert(PngGray8.width(png) == w)
      assert(PngGray8.height(png) == h)
      val px = ints(PngGray8.pixels(png))
      assert(px.length == h * w)
      assert(px.take(n) == p.toSeq.map(_ & 0xff))
      assert(px.drop(n).forall(_ == 0), "zero tail expected")
    }
  }

  test("encode assigns filter row%5 — any image of ≥5 rows exercises all five") {
    val png = PngGray8.encode(det(1, 16 * 7), 16)
    assert(ints(PngGray8.filterTypes(png)) == Seq(0, 1, 2, 3, 4, 0, 1))
  }

  test("JDK ImageIO decodes our encoder's output to the same pixels") {
    for (n <- Seq(1, 80, 1000, 4099)) {
      val p = det(n, n)
      val png = PngGray8.encode(p, 16)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null, "ImageIO could not parse our PNG")
      assert(img.getWidth == 16)
      val ours = ints(PngGray8.pixels(png))
      val theirs = for (y <- 0 until img.getHeight; x <- 0 until 16)
        yield img.getRaster.getSample(x, y, 0)
      assert(theirs == ours, s"pixel mismatch at n=$n")
    }
  }

  test("our decoder reads a PNG the JDK encoder produced (independent filters/compression)") {
    for (n <- Seq(33, 257, 2048)) {
      val p = det(n + 7, n)
      val h = (n + 15) / 16
      val img = new java.awt.image.BufferedImage(16, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until 16) {
        val i = y * 16 + x
        img.getRaster.setSample(x, y, 0, if (i < n) p(i) & 0xff else 0)
      }
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", buf))
      val px = ints(PngGray8.pixels(buf.toByteArray))
      val expected = (0 until h * 16).map(i => if (i < n) p(i) & 0xff else 0)
      assert(px == expected, s"decode mismatch at n=$n")
    }
  }

  test("malformed containers are rejected with descriptive errors") {
    val good = PngGray8.encode(det(5, 100), 16)
    def rejects(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](PngGray8.pixels(bad))
      assert(e.getMessage.startsWith("png:"), s"$what: ${e.getMessage}")
    }
    rejects(b => { b(0) = 'X'; b }, "bad signature")
    rejects(b => { b(20) = (b(20) ^ 1).toByte; b }, "IHDR corruption -> CRC")
    rejects(b => b.take(b.length - 4), "truncated container")
    rejects(b => b ++ Array[Byte](0), "trailing bytes after IEND")
    // color type: flip IHDR byte 17 (offset 8+8+9=25) and fix the CRC so
    // the failure is the documented color-type rejection, not CRC
    rejects({ b =>
      b(25) = 2 // truecolor
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      val v = crc.getValue.toInt
      b(29) = (v >> 24).toByte; b(30) = (v >> 16).toByte
      b(31) = (v >> 8).toByte; b(32) = v.toByte
      b
    }, "wrong color type")
  }

  test("RGB24 round-trip: decode(encode(payload)) == payload + zero tail") {
    for ((n, w) <- Seq((0, 8), (1, 8), (23, 8), (24, 8), (25, 8),
        (240, 8), (1000, 5))) {
      val p = det(n * 17 + w, n)
      val png = PngGray8.encodeRgb24(p, w)
      val rowBytes = w * 3
      val h = math.max(1, (n + rowBytes - 1) / rowBytes)
      assert(PngGray8.width(png) == w)
      assert(PngGray8.height(png) == h)
      val px = ints(PngGray8.pixelsRgb24(png))
      assert(px.length == h * rowBytes)
      assert(px.take(n) == p.toSeq.map(_ & 0xff))
      assert(px.drop(n).forall(_ == 0), "zero tail expected")
    }
  }

  test("RGB24: ImageIO reads our truecolor PNG to the same channels") {
    // ≥5 rows (all five filters at the bpp=3 stride) + ragged tail;
    // getRGB sidesteps the raster's internal BGR band order entirely
    val n = 24 * 7 + 5
    val p = det(99, n)
    val png = PngGray8.encodeRgb24(p, 8)
    assert(ints(PngGray8.filterTypes(png)).take(5) == Seq(0, 1, 2, 3, 4))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse our truecolor PNG")
    assert(img.getWidth == 8)
    val ours = ints(PngGray8.pixelsRgb24(png))
    for (y <- 0 until img.getHeight; x <- 0 until 8) {
      val v = img.getRGB(x, y)
      val i = (y * 8 + x) * 3
      assert(((v >> 16) & 0xff) == ours(i) &&
        ((v >> 8) & 0xff) == ours(i + 1) && (v & 0xff) == ours(i + 2),
        s"channel mismatch at ($x,$y)")
    }
  }

  test("RGB24: our decoder reads a JDK-encoded truecolor PNG " +
    "(independent filters/compression/stride)") {
    val n = 3 * 8 * 9
    val p = det(7, n)
    val h = n / 24
    val img = new java.awt.image.BufferedImage(8, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until 8) {
      val i = (y * 8 + x) * 3
      img.setRGB(x, y, ((p(i) & 0xff) << 16) | ((p(i + 1) & 0xff) << 8) |
        (p(i + 2) & 0xff))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val px = ints(PngGray8.pixelsRgb24(buf.toByteArray))
    assert(px == p.toSeq.map(_ & 0xff), "JDK-encoded RGB decode mismatch")
  }

  test("color-type pinning: each decode entry rejects the other's container") {
    val gray = PngGray8.encode(det(3, 64), 16)
    val rgb = PngGray8.encodeRgb24(det(4, 72), 8)
    val e1 = intercept[IllegalArgumentException](PngGray8.pixelsRgb24(gray))
    assert(e1.getMessage.contains("color type"))
    val e2 = intercept[IllegalArgumentException](PngGray8.pixels(rgb))
    assert(e2.getMessage.contains("color type"))
  }

  test("decoder requires the concatenated IDAT stream (not just the first chunk)") {
    // drop the second IDAT chunk and fix nothing else: the inflate must
    // fail on the truncated stream rather than return partial pixels
    val png = PngGray8.encode(det(9, 1000), 16)
    def chunks(b: Array[Byte]): Seq[(String, Int, Int)] = {
      var off = 8
      val out = Seq.newBuilder[(String, Int, Int)]
      while (off < b.length) {
        val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        out += ((new String(b, off + 4, 4, "US-ASCII"), off, 12 + len))
        off += 12 + len
      }
      out.result()
    }
    val cs = chunks(png)
    assert(cs.count(_._1 == "IDAT") == 2, "encoder must split IDAT in two")
    val (_, off, sz) = cs.filter(_._1 == "IDAT")(1)
    val cut = png.take(off) ++ png.drop(off + sz)
    val e = intercept[IllegalArgumentException](PngGray8.pixels(cut))
    assert(e.getMessage.contains("deflate") ||
      e.getMessage.contains("inflated"))
  }

  // ---------------------------------------------------------------
  // Palette (color type 3)
  // ---------------------------------------------------------------

  private def chunkSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    var off = 8
    val out = Seq.newBuilder[(String, Int, Int)]
    while (off < b.length) {
      val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      out += ((new String(b, off + 4, 4, "US-ASCII"), off, 12 + len))
      off += 12 + len
    }
    out.result()
  }

  private def resolved(indices: Seq[Int]): Seq[Int] =
    indices.flatMap { i =>
      val (r, g, b) = PngGray8.paletteEntry(i)
      Seq(r, g, b)
    }

  test("palette round-trip: indices resolve through the stored PLTE " +
    "(tail index 0 is NON-zero RGB)") {
    for ((n, w) <- Seq((0, 16), (1, 16), (100, 16), (160, 16), (161, 16),
        (1000, 7))) {
      val p = det(n * 13 + w, n)
      val png = PngGray8.encodePalette(p, w)
      val h = math.max(1, (n + w - 1) / w)
      assert(PngGray8.width(png) == w && PngGray8.height(png) == h)
      val px = ints(PngGray8.pixelsPaletteRgb(png))
      assert(px.length == h * w * 3)
      val idx = (0 until h * w).map(i => if (i < n) p(i) & 0xff else 0)
      assert(px == resolved(idx))
      if (h * w > n)
        assert(px.takeRight(3) == Seq(11, 29, 47),
          "zero tail must resolve to the non-zero palette entry 0")
    }
  }

  test("palette: filter coverage row%5 holds for the indexed form too") {
    val png = PngGray8.encodePalette(det(2, 16 * 6), 16)
    assert(ints(PngGray8.filterTypes(png)) == Seq(0, 1, 2, 3, 4, 0))
  }

  test("palette: ImageIO resolves our indexed PNG to the same RGB") {
    val n = 16 * 7 + 3
    val p = det(55, n)
    val png = PngGray8.encodePalette(p, 16)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse our palette PNG")
    assert(img.getWidth == 16)
    val ours = ints(PngGray8.pixelsPaletteRgb(png))
    for (y <- 0 until img.getHeight; x <- 0 until 16) {
      val v = img.getRGB(x, y)
      val i = (y * 16 + x) * 3
      assert(((v >> 16) & 0xff) == ours(i) &&
        ((v >> 8) & 0xff) == ours(i + 1) && (v & 0xff) == ours(i + 2),
        s"palette resolution mismatch at ($x,$y)")
    }
  }

  test("palette: our decoder reads a JDK-encoded indexed PNG " +
    "(independent PLTE layout/filters/compression)") {
    val n = 16 * 5
    val p = det(77, n)
    val rs = new Array[Byte](256)
    val gs = new Array[Byte](256)
    val bs = new Array[Byte](256)
    for (i <- 0 until 256) {
      val (r, g, b) = PngGray8.paletteEntry(i)
      rs(i) = r.toByte; gs(i) = g.toByte; bs(i) = b.toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, 256, rs, gs, bs)
    val img = new java.awt.image.BufferedImage(16, 5,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 5; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, p(y * 16 + x) & 0xff)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    // the JDK may reorder/trim ITS palette — the RESOLVED RGB stream is
    // the invariant, and it must equal our formula-resolved indices
    val px = ints(PngGray8.pixelsPaletteRgb(buf.toByteArray))
    assert(px == resolved(p.toSeq.map(_ & 0xff)),
      "JDK-encoded indexed decode mismatch")
  }

  test("palette: malformed PLTE placement/size and OOR indices rejected") {
    // payload guaranteed to contain an index beyond a 1-entry palette
    val p = det(6, 100).zipWithIndex
      .map { case (b, i) => if (i == 3) 200.toByte else b }
    val png = PngGray8.encodePalette(p, 16)
    val cs = chunkSpans(png)
    val Some((_, poff, psz)) = cs.find(_._1 == "PLTE")

    // (a) strip PLTE entirely → required-chunk error
    val noPlte = png.take(poff) ++ png.drop(poff + psz)
    val e1 = intercept[IllegalArgumentException](
      PngGray8.pixelsPaletteRgb(noPlte))
    assert(e1.getMessage.contains("PLTE"))

    // (b1) ct-3 stream with PLTE moved after IDAT: the required-before-
    // IDAT rule fires at the first IDAT (the stricter, earlier error)
    val plteBytes = png.slice(poff, poff + psz)
    val Some((_, ioff, isz)) = cs.find(_._1 == "IDAT")
    val afterIdatEnd = ioff + isz - psz // position in the PLTE-less stream
    val moved = noPlte.take(afterIdatEnd) ++ plteBytes ++
      noPlte.drop(afterIdatEnd)
    val e2 = intercept[IllegalArgumentException](
      PngGray8.pixelsPaletteRgb(moved))
    assert(e2.getMessage.contains("requires a PLTE before IDAT"))

    // (b2) the PLTE-after-IDAT placement rule itself, on a truecolor
    // container (where PLTE is optional, so the ct-3 rule can't mask it)
    val rgb = PngGray8.encodeRgb24(det(8, 72), 8)
    val rcs = chunkSpans(rgb)
    val Some((_, rioff, risz)) = rcs.find(_._1 == "IDAT")
    val rgbMoved = rgb.take(rioff + risz) ++ plteBytes ++
      rgb.drop(rioff + risz)
    val e2b = intercept[IllegalArgumentException](
      PngGray8.pixelsRgb24(rgbMoved))
    assert(e2b.getMessage.contains("PLTE after IDAT"))

    // (c) truncate PLTE to ONE entry (length 3, CRC fixed) → the stored
    // index 200 must fail the range check, not silently clamp
    val tiny = new java.io.ByteArrayOutputStream()
    tiny.write(png, 0, poff)
    tiny.write(Array[Byte](0, 0, 0, 3))
    tiny.write("PLTE".getBytes("US-ASCII"))
    tiny.write(png, poff + 8, 3)
    val crc = new java.util.zip.CRC32
    crc.update("PLTE".getBytes("US-ASCII"))
    crc.update(png, poff + 8, 3)
    val cv = crc.getValue.toInt
    tiny.write(Array[Byte]((cv >> 24).toByte, (cv >> 16).toByte,
      (cv >> 8).toByte, cv.toByte))
    tiny.write(png, poff + psz, png.length - poff - psz)
    val e3 = intercept[IllegalArgumentException](
      PngGray8.pixelsPaletteRgb(tiny.toByteArray))
    assert(e3.getMessage.contains("out of range"))

    // (d) color-type pinning both ways
    val gray = PngGray8.encode(det(3, 64), 16)
    val e4 = intercept[IllegalArgumentException](
      PngGray8.pixelsPaletteRgb(gray))
    assert(e4.getMessage.contains("color type"))
    val e5 = intercept[IllegalArgumentException](PngGray8.pixels(png))
    assert(e5.getMessage.contains("color type"))
  }

  // -----------------------------------------------------------------
  // Adam7 interlacing
  // -----------------------------------------------------------------

  test("Adam7 round-trip: deinterlaced decode == payload + zero tail " +
    "across pass-geometry corners") {
    // heights chosen to hit every pass-emptiness corner: h=1 (passes
    // 3/5/7 empty), h=2 (pass 3/5... partial), h=4, h=5 (pass 3 gains
    // its first row), h=8 (full first cycle), h=9, h=16, plus a ragged
    // tail and a non-multiple width
    for ((n, w) <- Seq((0, 16), (1, 16), (15, 16), (16, 16), (31, 16),
        (63, 16), (64, 16), (79, 16), (128, 16), (137, 16), (256, 16),
        (1000, 7), (4096, 64))) {
      val p = det(n * 37 + w, n)
      val png = PngGray8.encodeAdam7(p, w)
      val h = math.max(1, (n + w - 1) / w)
      assert(PngGray8.width(png) == w)
      assert(PngGray8.height(png) == h)
      val px = ints(PngGray8.pixelsAdam7(png))
      assert(px.length == h * w, s"n=$n w=$w")
      assert(px.take(n) == p.toSeq.map(_ & 0xff), s"n=$n w=$w")
      assert(px.drop(n).forall(_ == 0), s"zero tail expected n=$n w=$w")
    }
  }

  test("Adam7: ≥5 total pass rows exercise all five filters, proven " +
    "in-band") {
    val png = PngGray8.encodeAdam7(det(9, 16 * 8), 16)
    val fs = ints(PngGray8.filterTypesAdam7(png))
    // h=8: pass rows = 1+1+1+2+2+4+4 = 15, filters cycle 0..4
    assert(fs.length == 15)
    assert(fs == (0 until 15).map(_ % 5))
    assert(fs.toSet == Set(0, 1, 2, 3, 4))
  }

  test("Adam7: JDK ImageIO decodes our interlaced PNG to the same " +
    "deinterlaced pixels") {
    val n = 16 * 9 + 5 // ragged tail, 10 rows
    val p = det(42, n)
    val png = PngGray8.encodeAdam7(p, 16)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse our interlaced PNG")
    assert(img.getWidth == 16 && img.getHeight == 10)
    val ours = ints(PngGray8.pixelsAdam7(png))
    for (y <- 0 until 10; x <- 0 until 16) {
      // raw raster sample — getRGB would gamma-convert linear gray
      val v = img.getRaster.getSample(x, y, 0)
      assert(v == ours(y * 16 + x), s"pixel mismatch at ($x,$y)")
    }
  }

  test("Adam7: our decoder reads a JDK-encoded interlaced PNG " +
    "(independent pass filters/compression)") {
    val w = 16; val h = 9
    val p = det(7, w * h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, p(y * w + x) & 0xff)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val png = buf.toByteArray
    // sanity: the JDK really wrote an interlaced container (IHDR byte
    // 12 of the chunk data, offset 8+8+12 in the file, equals 1)
    assert((png(8 + 8 + 12) & 0xff) == 1,
      "JDK writer did not produce an interlaced PNG")
    val px = ints(PngGray8.pixelsAdam7(png))
    assert(px == p.toSeq.map(_ & 0xff),
      "JDK-encoded interlaced decode mismatch")
  }

  test("Adam7: interlace pinning — each decode entry rejects the " +
    "other's container") {
    val p = det(3, 64)
    val seq = PngGray8.encode(p, 16)
    val lace = PngGray8.encodeAdam7(p, 16)
    val e1 = intercept[IllegalArgumentException](PngGray8.pixelsAdam7(seq))
    assert(e1.getMessage.contains("sequential"))
    val e2 = intercept[IllegalArgumentException](PngGray8.pixels(lace))
    assert(e2.getMessage.contains("interlaced"))
    val e3 = intercept[IllegalArgumentException](PngGray8.filterTypes(lace))
    assert(e3.getMessage.contains("interlaced"))
    val e4 = intercept[IllegalArgumentException](
      PngGray8.filterTypesAdam7(seq))
    assert(e4.getMessage.contains("sequential"))
  }
}
