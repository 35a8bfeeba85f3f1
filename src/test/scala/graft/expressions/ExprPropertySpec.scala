package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codegen expression kernels: each must be
  * bit-identical to the built-in-expression chain it replaced (or to an
  * obviously-correct scala model) on arbitrary generated inputs, not
  * just the fixtures the unit specs pin. Raw ScalaCheck generators over
  * fixed seeds (scalatestplus bridge isn't on the offline classpath;
  * fixed seeds also make failures exactly reproducible). */
class ExprPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ 'ü')))
  private val text: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  test("shingle_hashes == sorted distinct xxhash64 of the string shingles") {
    graft.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    for (seed <- 0 until 20) {
      val texts = sample(Gen.listOfN(12, text), seed)
      val k = Seq(2, 3, 5)(seed % 3)
      val df = texts.toDF("text")
      // model: the interpreted built-in chain (shinglesOf + xxhash64)
      val w = split($"text", " ")
      val sh = when(size(w) < k, array($"text")).otherwise(
        array_distinct(transform(sequence(lit(1), size(w) - (k - 1)),
          i => concat_ws(" ", slice(w, i, lit(k))))))
      val model = array_sort(array_distinct(transform(sh, x => xxhash64(x))))
      val both = df.select(
        expr(s"shingle_hashes(text, $k)").as("fast"), model.as("slow"))
      assert(both.filter($"fast" =!= $"slow").count() == 0, s"seed=$seed k=$k")
    }
  }

  test("shingle_strings == the interpreted shinglesOf chain") {
    graft.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    for (seed <- 0 until 20) {
      val texts = sample(Gen.listOfN(12, text), 500 + seed)
      val k = Seq(2, 3, 5)(seed % 3)
      val df = texts.toDF("text")
      val w = split($"text", " ")
      val model = when(size(w) < k, array($"text")).otherwise(
        array_distinct(transform(sequence(lit(1), size(w) - (k - 1)),
          i => concat_ws(" ", slice(w, i, lit(k))))))
      val both = df.select(
        expr(s"shingle_strings(text, $k)").as("fast"), model.as("slow"))
      assert(both.filter($"fast" =!= $"slow").count() == 0, s"seed=$seed k=$k")
    }
  }

  test("jaccard_sorted == set-model Jaccard on arbitrary long sets") {
    graft.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val longSet = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100L, 100L)).map(_.distinct.sorted))
    val pairs = (0 until 40).map(i =>
      (sample(longSet, i), sample(longSet, 1000 + i)))
    val got = pairs.toDF("a", "b")
      .select(expr("jaccard_sorted(a, b)")).collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      val expected =
        if (a.isEmpty && b.isEmpty) 1.0
        else a.toSet.intersect(b.toSet).size.toDouble /
          a.toSet.union(b.toSet).size
      assert(math.abs(g - expected) < 1e-12, s"a=$a b=$b")
    }
  }

  test("uuid5 column minter == JVM minter on arbitrary strings") {
    import spark.implicits._
    val m = graft.ids.IdMinter.gtex
    val anyStr = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('|', '/', ' ',
        'é', '中', '-', '.'))).map(_.mkString))
    val vs = (0 until 60).map(i => sample(anyStr, i))
    val got = vs.toDF("v").select(m.mintCol($"v")).collect()
      .map(_.getString(0)).toSeq
    assert(got == vs.map(m.mint))
  }

  test("png round-trip (gray8 AND rgb24) == payload + zero tail, " +
    "ImageIO agrees, on arbitrary payload/width") {
    for (seed <- 0 until 12) {
      val n = sample(Gen.chooseNum(0, 3000), seed * 7 + 1)
      val w = sample(Gen.chooseNum(1, 40), seed * 7 + 2)
      val payload = sample(Gen.listOfN(n, Gen.chooseNum(-128, 127)),
        seed * 7 + 3).map(_.toByte).toArray
      val g = PngGray8.encode(payload, w)
      val gp = PngGray8.pixels(g).toIntArray().toSeq
      val gh = math.max(1, (n + w - 1) / w)
      assert(gp.length == gh * w && gp.take(n) == payload.toSeq.map(_ & 0xff)
        && gp.drop(n).forall(_ == 0), s"gray8 round-trip at n=$n w=$w")
      val c = PngGray8.encodeRgb24(payload, w)
      val cp = PngGray8.pixelsRgb24(c).toIntArray().toSeq
      val rb = w * 3
      val ch = math.max(1, (n + rb - 1) / rb)
      assert(cp.length == ch * rb && cp.take(n) == payload.toSeq.map(_ & 0xff)
        && cp.drop(n).forall(_ == 0), s"rgb24 round-trip at n=$n w=$w")
      // decoder-independence at arbitrary geometry: the JDK codec must
      // read our truecolor container to the identical channels
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(c))
      assert(img != null && img.getWidth == w && img.getHeight == ch)
      for (y <- 0 until ch; x <- 0 until w) {
        val v = img.getRGB(x, y)
        val i = (y * w + x) * 3
        assert(((v >> 16) & 0xff) == cp(i) && ((v >> 8) & 0xff) == cp(i + 1)
          && (v & 0xff) == cp(i + 2), s"ImageIO mismatch ($x,$y) n=$n w=$w")
      }
    }
  }

  test("png Adam7 round-trip == payload + zero tail AND == the " +
    "sequential decode, ImageIO agrees, on arbitrary payload/width") {
    for (seed <- 0 until 12) {
      val n = sample(Gen.chooseNum(0, 3000), seed * 11 + 1)
      val w = sample(Gen.chooseNum(1, 40), seed * 11 + 2)
      val payload = sample(Gen.listOfN(n, Gen.chooseNum(-128, 127)),
        seed * 11 + 3).map(_.toByte).toArray
      val lace = PngGray8.encodeAdam7(payload, w)
      val lp = PngGray8.pixelsAdam7(lace).toIntArray().toSeq
      val h = math.max(1, (n + w - 1) / w)
      assert(lp.length == h * w && lp.take(n) == payload.toSeq.map(_ & 0xff)
        && lp.drop(n).forall(_ == 0), s"Adam7 round-trip at n=$n w=$w")
      // interlacing is a layout choice, not a semantic one: the
      // deinterlaced image must equal the sequential container's decode
      val sp = PngGray8.pixels(PngGray8.encode(payload, w))
        .toIntArray().toSeq
      assert(lp == sp, s"Adam7 != sequential decode at n=$n w=$w")
      // decoder-independence at arbitrary pass geometry
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(lace))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == lp(y * w + x),
          s"ImageIO mismatch ($x,$y) n=$n w=$w")
    }
  }

  test("simhash64 is word-order-insensitive (bag-of-words sketch)") {
    graft.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val pairs = (0 until 20).map { i =>
      val ws = sample(Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)), i)
      val shuffled = new scala.util.Random(i).shuffle(ws)
      (ws.mkString(" "), shuffled.mkString(" "))
    }
    val rows = pairs.toDF("a", "b")
      .select(expr("simhash64(a)"), expr("simhash64(b)")).collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getLong(0) == r.getLong(1), s"'$a' vs '$b'")
    }
  }
}
