package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The AnchorWindows kernel against an independent naive reference:
  * same anchor rule recomputed with plain String code-point slicing —
  * the kernel's offset arithmetic (not its intent) is what the fast
  * path could get wrong. Deterministic pseudo-random inputs (seeded)
  * including multibyte text and every boundary length. */
class AnchorWindowsSpec extends AnyFunSuite {

  private def naive(s: String, k: Int, w: Int, mod: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    def slice(from: Int, len: Int) =
      new String(cps, from, len)
    (0 to cps.length - w).filter { i =>
      Md5Hash64.lower63(slice(i, k)) % mod == 0
    }.map(i => slice(i, w))
  }

  private def fast(s: String, k: Int, w: Int, mod: Int): Seq[String] =
    AnchorWindows.eval(UTF8String.fromString(s), k, w, mod)
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq

  test("kernel == naive reference on seeded random ASCII text") {
    val rnd = new scala.util.Random(42)
    for (len <- Seq(0, 1, 31, 32, 33, 100, 500)) {
      val s = Iterator.continually(rnd.nextPrintableChar()).take(len).mkString
      assert(fast(s, 4, 32, 8) == naive(s, 4, 32, 8), s"len=$len")
    }
  }

  test("kernel == naive reference on multibyte (CJK + accents) text") {
    val rnd = new scala.util.Random(7)
    val alphabet = "的是了在我有和就不人abcde ÄöüéàñØ"
    for (len <- Seq(31, 32, 64, 200)) {
      val s = Iterator.continually(alphabet(rnd.nextInt(alphabet.length)))
        .take(len).mkString
      assert(fast(s, 4, 32, 8) == naive(s, 4, 32, 8), s"len=$len")
    }
  }

  test("parameter variants agree with the reference") {
    val s = "the quick brown fox jumps over the lazy dog " * 8
    for ((k, w, m) <- Seq((2, 8, 4), (4, 32, 8), (8, 16, 2), (1, 1, 1)))
      assert(fast(s, k, w, m) == naive(s, k, w, m), s"k=$k w=$w mod=$m")
  }
}
