package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values, "bottom-k") distinct-value sketch as a native
  * Catalyst [[TypedImperativeAggregate]] — the engine's first
  * imperative aggregate with BOUNDED state, and the reason it scales:
  * each map task keeps at most k longs per group (a sorted distinct
  * buffer), partial aggregation combines map-side, and the shuffle
  * carries ≤ k values per (group, partition) instead of the group's
  * full value set. A `collect_set`-then-slice formulation would ship
  * every distinct value through the shuffle; a window row_number would
  * shuffle the entire corpus onto |groups| partitions. This is the
  * textbook sketch for DISTINCT-SET OVERLAP estimation (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD'07): unlike HLL (q93), two KMV sketches support
  * union (k smallest of the merged sketches), intersection and Jaccard
  * estimates — the "how much do these two 50-TB sources overlap"
  * question answered from two k-row summaries without ever joining the
  * corpora.
  *
  * Determinism: the sketch of a multiset is the sorted set of its k
  * smallest DISTINCT hash values — order-independent, duplicate-
  * insensitive, losslessly mergeable (merge ≡ sketch of the union),
  * so given a replayable hash the ENTIRE sketch — every value, not
  * just the estimate — is replayed exactly by the DuckDB oracle
  * (`list_sort(list_distinct(...))[:k]`). No tolerance, no hash-
  * domain mismatch: callers feed it an md5-derived non-negative long
  * both engines compute identically.
  *
  * eval returns the ascending value array (≤ k longs). Cardinality /
  * overlap estimators are plain column arithmetic on top (the query
  * layer's job), keeping this aggregate a pure synopsis operator.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"kmv_sketch: k out of range ($k)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint hash column, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  /** Bounded insert: keep only values that can still be among the k
    * smallest; evict the current maximum when full. TreeSet gives
    * distinctness and ascending iteration in one structure. */
  private def add(buf: java.util.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = new java.util.TreeSet[Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
