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
}
