package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must be a true synopsis: k-bounded
  * state under any insert order, lossless merge (merge ≡ top-k of the
  * union), duplicate-insensitive, and byte-stable through
  * serialize/deserialize — the properties that let the driver shuffle
  * partial buffers instead of row sets. */
class TopKPairsSpec extends AnyFunSuite {

  private def agg(k: Int) = TopKPairsAgg(
    org.apache.spark.sql.catalyst.expressions.Literal(0L),
    org.apache.spark.sql.catalyst.expressions.Literal(0L), k)

  private def fill(a: TopKPairsAgg, pairs: Seq[(Long, Long)]) = {
    val buf = a.createAggregationBuffer()
    // drive the bounded insert through merge (update needs bound rows;
    // merge exercises the identical add path)
    pairs.foreach { p =>
      val one = a.createAggregationBuffer(); one.add(p); a.merge(buf, one)
    }
    buf
  }

  private def pairsOf(buf: java.util.TreeSet[(Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toList
  }

  test("keeps the k lexicographically smallest pairs, any order") {
    val a = agg(3)
    val data = Seq((5L, 1L), (1L, 9L), (3L, 3L), (1L, 2L), (7L, 0L))
    for (perm <- data.permutations.take(24)) {
      val buf = fill(a, perm)
      assert(pairsOf(buf) == List((1L, 2L), (1L, 9L), (3L, 3L)),
        s"order-dependent result for $perm")
    }
  }

  test("duplicate-insensitive and tie-broken by the second component") {
    val a = agg(2)
    val buf = fill(a, Seq((4L, 4L), (4L, 4L), (4L, 2L), (4L, 9L), (4L, 2L)))
    assert(pairsOf(buf) == List((4L, 2L), (4L, 4L)))
  }

  test("merge equals the top-k of the union") {
    val a = agg(4)
    val left = Seq((9L, 1L), (2L, 2L), (5L, 5L), (1L, 1L))
    val right = Seq((3L, 3L), (0L, 7L), (8L, 8L), (2L, 1L))
    val l = fill(a, left); val r = fill(a, right)
    val merged = a.merge(l, r)
    val expect = (left ++ right).distinct.sorted.take(4)
    assert(pairsOf(merged) == expect)
  }

  test("serialize/deserialize round-trips the sorted buffer") {
    val a = agg(8)
    val buf = fill(a, Seq((3L, 1L), (-2L, 5L), (7L, 7L), (Long.MinValue, 0L)))
    val back = a.deserialize(a.serialize(buf))
    assert(pairsOf(back) == pairsOf(buf))
  }

  test("negative keys encode descending order without range loss") {
    // (a, b) = (−x, id): the largest x wins, ties by smallest id, and
    // full-range longs survive (no bit packing)
    val a = agg(2)
    val xs = Seq((100L, 10L), (100L, 3L), (99L, 1L), (1L << 50, 2L))
    val buf = fill(a, xs.map { case (x, id) => (-x, id) })
    assert(pairsOf(buf).map { case (na, id) => (-na, id) } ==
      List((1L << 50, 2L), (100L, 3L)))
  }
}
