package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the third bounded-state imperative
  * aggregate (after [[KmvSketchAgg]] and [[TopKPairsAgg]]), closing
  * the frequency side of the sketch family: HLL (q93) and KMV (qb8)
  * answer "how many distinct", CMS (q9e) answers "how often is THIS
  * key", and Misra–Gries answers "WHICH keys dominate" from k
  * counters in one pass — the top-frequent-items question a
  * 100 TB monitor cannot answer with an exact group-by, whose
  * shuffle carries the full distinct-key domain.
  *
  * Mechanics (Misra & Gries 1982): k counters; a seen item
  * increments its counter, an unseen item claims a free counter at 1,
  * and when all k are claimed every counter decrements by 1 (zeros
  * evicted, the new item discarded) — each decrement round burns
  * k+1 occurrences, so rounds ≤ n/(k+1) and any item's estimate
  * undercounts its true frequency by AT MOST n/(k+1). Partial
  * aggregation combines map-side; the merge is the mergeable-
  * summaries form (Agarwal et al., PODS'12): sum counters pointwise,
  * then subtract the (k+1)-th largest value and drop non-positives —
  * the result is again ≤ k counters and the n/(k+1) error bound
  * holds for the COMBINED stream under ANY merge tree. The shuffle
  * therefore carries ≤ k (item, count) pairs per (group, partition)
  * regardless of the key domain's size or skew.
  *
  * Determinism: the sketch CONTENTS depend on partition layout (which
  * borderline items survive is order-dependent — inherent to the
  * algorithm, not this implementation), but the GUARANTEES do not:
  * for any layout, (1) every item with true count > n/(k+1) is
  * present, (2) estimates never overcount, (3) undercount ≤ n/(k+1),
  * (4) state ≤ k entries. Callers must emit only guarantee-derived
  * booleans and exact-arm counts (qc4's discipline), never raw
  * estimates, when a result must be layout-invariant and
  * oracle-replayable.
  *
  * eval returns array<struct<item, est>> sorted by item (≤ k
  * entries); lookup/threshold logic is plain column arithmetic on
  * top (map_from_entries + element_at).
  */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 16), s"mg_sketch: k out of range ($k)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch requires a bigint item column, got ${child.dataType}")

  // explicit boxed types: java.util.HashMap.get returns null for an
  // absent key, and Scala's primitive-Long unboxing would silently turn
  // that null into 0L — the boxed signature keeps absence visible
  override def createAggregationBuffer()
      : java.util.HashMap[java.lang.Long, java.lang.Long] =
    new java.util.HashMap[java.lang.Long, java.lang.Long]()

  override def update(buf: java.util.HashMap[java.lang.Long, java.lang.Long],
      input: InternalRow)
      : java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buf.get(item)
      if (cur != null) buf.put(item, java.lang.Long.valueOf(cur + 1L))
      else if (buf.size < k) buf.put(item, java.lang.Long.valueOf(1L))
      else {
        // all k counters claimed by other items: the decrement round —
        // k stored occurrences + the incoming one are burned together
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[java.lang.Long, java.lang.Long],
      other: java.util.HashMap[java.lang.Long, java.lang.Long])
      : java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue + e.getValue.longValue))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everything and drop
      // non-positives: ≤ k survive and the combined-stream bound holds
      val vals = new Array[Long](buf.size)
      var i = 0
      val vi = buf.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next().longValue; i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - (k + 1)) // (k+1)-th largest
      val ei = buf.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue.longValue <= m) ei.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - m))
      }
    }
    buf
  }

  override def eval(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
    val items = new Array[Long](buf.size)
    var i = 0
    val ki = buf.keySet().iterator()
    while (ki.hasNext) { items(i) = ki.next().longValue; i += 1 }
    java.util.Arrays.sort(items)
    val out = new Array[Any](items.length)
    i = 0
    while (i < items.length) {
      out(i) = new GenericInternalRow(
        Array[Any](items(i), buf.get(java.lang.Long.valueOf(items(i)))
          .longValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.HashMap[java.lang.Long, java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue); bb.putLong(e.getValue.longValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining)
      buf.put(java.lang.Long.valueOf(bb.getLong),
        java.lang.Long.valueOf(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): MgSketchAgg = copy(child = newChild)
}
