package graft.expressions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Greedy left-to-right BPE merge semantics — including the overlap
  * cases where naive implementations diverge from the leftmost-repeat
  * definition the oracle replays. */
class BpeMergeWordSpec extends AnyFunSuite {

  private def m(tokens: Seq[String], a: String, b: String): Seq[String] = {
    val arr = new GenericArrayData(
      tokens.map(UTF8String.fromString).toArray[Any])
    BpeMergeWord.merge(arr, UTF8String.fromString(a),
      UTF8String.fromString(b))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  test("non-overlapping left-to-right merge") {
    assert(m(Seq("a", "b", "c", "a", "b"), "a", "b") ==
      Seq("ab", "c", "ab"))
  }

  test("overlapping same-token runs merge greedily, no re-pairing") {
    assert(m(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(m(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
  }

  test("absent pair leaves tokens unchanged; merges chain across rounds") {
    assert(m(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    val r1 = m(Seq("a", "b", "c"), "a", "b")
    assert(m(r1, "ab", "c") == Seq("abc"))
  }

  test("multibyte tokens merge by code point, not bytes") {
    assert(m(Seq("的", "是", "的"), "的", "是") == Seq("的是", "的"))
  }

  test("single L2R scan == leftmost-repeat reference on random streams") {
    // the oracle replays the leftmost-repeat form; the kernel runs one
    // left-to-right scan — the equivalence argument (a merged token is
    // strictly longer than either input) is here checked by brute force
    // on dense random streams over a tiny alphabet with self-pairs
    def leftmostRepeat(tokens: List[String], a: String,
        b: String): List[String] = {
      val idx =
        if (tokens.size < 2) -1
        else tokens.zip(tokens.tail).indexWhere {
          case (x, y) => x == a && y == b
        }
      if (idx < 0) tokens
      else leftmostRepeat(
        tokens.take(idx) ++ ((a + b) :: tokens.drop(idx + 2)), a, b)
    }
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "ab", "aa")
    for (trial <- 1 to 200) {
      val tokens = List.fill(rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length)))
      val a = alphabet(rnd.nextInt(alphabet.length))
      val b = alphabet(rnd.nextInt(alphabet.length))
      assert(m(tokens, a, b) == leftmostRepeat(tokens, a, b),
        s"trial $trial: tokens=$tokens pair=($a,$b)")
    }
  }
}
