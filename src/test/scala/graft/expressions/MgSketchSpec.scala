package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries aggregate's value is its THEOREMS, not its contents
  * (which items survive a decrement is order-dependent by design), so
  * the spec pins exactly what qc4 emits as data: under ANY partition
  * split and merge order, (1) every item with true count > n/(k+1) is
  * present, (2) no estimate overcounts, (3) every estimate's
  * undercount is ≤ n/(k+1), (4) state never exceeds k entries — plus
  * the exact-regime degenerate case (≤ k distinct items → exact
  * counts, no information loss) and byte-stable serialization. */
class MgSketchSpec extends AnyFunSuite {

  private def agg(k: Int) = MgSketchAgg(BoundReference(0, LongType, true), k)

  private def fill(a: MgSketchAgg, items: Seq[Long]) = {
    val buf = a.createAggregationBuffer()
    items.foreach(v => a.update(buf, new GenericInternalRow(Array[Any](v))))
    buf
  }

  private def asMap(buf: java.util.HashMap[java.lang.Long, java.lang.Long])
      : Map[Long, Long] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.map { case (k, v) => (k.longValue, v.longValue) }.toMap
  }

  /** Deterministic Zipf-ish stream: item = 64 / (1 + lcg % 64) — heavy
    * small items, long uniform tail, no java.util.Random dependence. */
  private def stream(n: Int): Seq[Long] = {
    var x = 42L
    (0 until n).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val u = java.lang.Long.remainderUnsigned(x, 64L)
      64L / (1L + u)
    }
  }

  private def checkGuarantees(k: Int, items: Seq[Long],
      sketch: Map[Long, Long]): Unit = {
    val n = items.size.toLong
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch.size <= k, s"state exceeded k: ${sketch.size} > $k")
    for ((item, est) <- sketch) {
      val t = truth.getOrElse(item, 0L)
      assert(est <= t, s"overcount: item $item est $est > true $t")
      assert((t - est) * (k + 1) <= n,
        s"undercount bound broken: item $item true $t est $est n $n k $k")
    }
    for ((item, t) <- truth if t * (k + 1) > n) {
      assert(sketch.contains(item),
        s"guaranteed-heavy item $item (true $t, n $n, k $k) missing")
      // a present-but-unstored heavy item would have est 0 > bound
      assert((t - sketch(item)) * (k + 1) <= n)
    }
  }

  test("exact regime: <= k distinct items means exact counts") {
    val a = agg(8)
    val items = Seq(1L, 2L, 1L, 3L, 1L, 2L, 4L, 1L)
    for (perm <- items.permutations.take(40)) {
      val m = asMap(fill(a, perm.toSeq))
      assert(m == Map(1L -> 4L, 2L -> 2L, 3L -> 1L, 4L -> 1L),
        s"lost counts without eviction pressure for $perm")
    }
  }

  test("update path: guarantees hold under eviction, any order") {
    val a = agg(2)
    val items = Seq(1L, 1L, 1L, 1L, 2L, 3L, 2L, 3L)
    for (perm <- items.permutations.take(60)) {
      val m = asMap(fill(a, perm.toSeq))
      checkGuarantees(2, perm.toSeq, m)
      assert(m.contains(1L), "the strictly-heavy item must survive")
    }
  }

  test("merge: guarantees hold for any partition split and merge order") {
    val items = stream(3000)
    val k = 16
    val a = agg(k)
    for (parts <- Seq(1, 2, 7, 32)) {
      val chunks = items.grouped(math.max(1, items.size / parts)).toSeq
      val bufs = chunks.map(c => fill(a, c))
      // left fold and right fold: different merge trees, same theorems
      val lm = bufs.reduceLeft((x, y) => a.merge(x, y))
      checkGuarantees(k, items, asMap(lm))
      val bufs2 = chunks.map(c => fill(a, c))
      val rm = bufs2.reduceRight((x, y) => a.merge(x, y))
      checkGuarantees(k, items, asMap(rm))
    }
  }

  test("merge overflow keeps at most k counters") {
    val a = agg(4)
    val l = fill(a, Seq(1L, 1L, 2L, 2L, 3L, 4L))
    val r = fill(a, Seq(5L, 5L, 6L, 6L, 7L, 8L))
    val m = asMap(a.merge(l, r))
    assert(m.size <= 4, s"merged size ${m.size} > k=4")
    checkGuarantees(4, Seq(1L, 1L, 2L, 2L, 3L, 4L, 5L, 5L, 6L, 6L, 7L, 8L), m)
  }

  test("serialize/deserialize round-trips the counter map") {
    val a = agg(16)
    val buf = fill(a, stream(500))
    val back = a.deserialize(a.serialize(buf))
    assert(asMap(back) == asMap(buf))
  }

  test("eval returns item-sorted struct rows") {
    val a = agg(8)
    val buf = fill(a, Seq(9L, 3L, 3L, 7L, 9L, 9L))
    val arr = a.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
    assert(rows == Seq((3L, 2L), (7L, 1L), (9L, 3L)))
  }
}
