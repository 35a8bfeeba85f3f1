package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded TOP-K aggregate as a native Catalyst
  * [[TypedImperativeAggregate]] — the engine answer to per-key top-k
  * over a SKEWED key distribution. The classic formulation
  * (`row_number() OVER (PARTITION BY key ORDER BY …)` then
  * `rank <= k`) shuffles the ENTIRE input onto |keys| partitions and
  * sorts each key's full row set in one task; AQE cannot split a
  * window partition, so at 100 TB a 40 %-share hot key means one task
  * sorting 40 TB. This aggregate keeps at most k (a, b) pairs per
  * group per map task (a sorted distinct buffer, lexicographic order),
  * partial aggregation combines map-side, and the shuffle carries
  * ≤ k pairs per (group, partition) — the hot key costs each map task
  * k entries, never a sort of its row share.
  *
  * The pair is the SORT KEY: callers encode "order by x DESC, id ASC"
  * as (a, b) = (−x, id) and read the result back off the returned
  * ascending array. Keeping both components as explicit bigints (not a
  * packed word) sidesteps the range compromises a bit-packing would
  * impose at corpus scale (doc_id beyond 2^40, scores beyond 2^20).
  *
  * Determinism: the result is the sorted set of the k
  * lexicographically-smallest DISTINCT pairs — order-independent,
  * duplicate-insensitive, losslessly mergeable (merge ≡ top-k of the
  * union), so the full output — every pair, in order — is replayed
  * exactly by a plain SQL window oracle. Same discipline as
  * [[KmvSketchAgg]] (which is precisely this structure over single
  * hashes); the two share the bounded-insert idiom.
  *
  * eval returns the ascending array<struct<a,b>> (≤ k entries); rank
  * assignment / key reconstruction is plain column arithmetic on top.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 16), s"topk_pairs: k out of range ($k)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires two bigint columns, got " +
        s"${left.dataType} / ${right.dataType}")

  // a named serializable comparator: the expression instance ships to
  // executors, and a SAM lambda field would fail task serialization
  private val ord: java.util.Comparator[(Long, Long)] = TopKPairsAgg.Ord

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  /** Bounded insert: keep only pairs that can still be among the k
    * smallest; evict the current maximum when full. */
  private def add(buf: java.util.TreeSet[(Long, Long)],
      v: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (ord.compare(v, buf.last) < 0 && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null)
      add(buf, (a.asInstanceOf[Long], b.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)])
      : java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (a, b) = it.next()
      out(i) = new GenericInternalRow(Array[Any](a, b))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (a, b) = it.next(); bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add((bb.getLong, bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {
  /** Lexicographic (a, b) order. */
  object Ord extends java.util.Comparator[(Long, Long)] with Serializable {
    override def compare(p: (Long, Long), q: (Long, Long)): Int = {
      val c = java.lang.Long.compare(p._1, q._1)
      if (c != 0) c else java.lang.Long.compare(p._2, q._2)
    }
  }
}
