package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Every k-char window of a string WITH its 1-based code-point
  * position — the seed emitter of the qba exact-substring pass (the
  * suffix-array/"ExactSubstr" dedup class needs every position, not a
  * content-selected subset like [[AnchorWindows]]: positions are what
  * the diagonal-island maximality argument runs on). One linear walk
  * with precomputed code-point byte offsets, same as AnchorWindows —
  * the built-in transform(sequence(...)) form is interpreted per
  * position and rescans from byte 0 per substring. */
object SeedWindows {
  def eval(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](n + 1)
    var b = 0
    var j = 0
    while (j < n) {
      offsets(j) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      j += 1
    }
    offsets(n) = bytes.length
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i + k <= n) {
      val row = new GenericInternalRow(2)
      row.setInt(0, i + 1)
      row.update(1,
        UTF8String.fromBytes(bytes, offsets(i), offsets(i + k) - offsets(i)))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SeedWindowsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"seed_windows: need k >= 1, got k=$k")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"seed_windows requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("win", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "seed_windows"
  override protected def nullSafeEval(t: Any): Any =
    SeedWindows.eval(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.expressions.SeedWindows.eval($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
