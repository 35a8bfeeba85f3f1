package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined anchor windows (winnowing/CDC selection) as ONE
  * codegen pass — the q4c kernel: position i (code-point indexed)
  * anchors a `w`-char window iff the md5-derived 63-bit hash of the
  * `k`-gram at i is ≡ 0 (mod `mod`). The hash basis is
  * [[Md5Hash64.lower63]] = DuckDB's `md5_number_lower(...) &
  * 9223372036854775807`, so the oracle replays anchor selection
  * exactly. The built-in transform/filter form of the same scan is
  * interpreted per position (lambda tree-walk + hex-string conv per
  * char) and measured ~4× slower at sf0.1; this walks the UTF-8 bytes
  * once with code-point indexing.
  */
object AnchorWindows {
  def eval(text: UTF8String, k: Int, w: Int, mod: Int): ArrayData = {
    // code-point byte offsets in ONE pass: UTF8String.substring rescans
    // from byte 0 per call, which would make this loop O(n²) per
    // document — precomputing offsets keeps it linear (plus the MD5s)
    val bytes = text.getBytes
    val n = text.numChars()
    val offsets = new Array[Int](n + 1)
    var b = 0
    var j = 0
    while (j < n) {
      offsets(j) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      j += 1
    }
    offsets(n) = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i + w <= n) {
      val gOff = offsets(i)
      if (Md5Hash64.lower63(bytes, gOff, offsets(i + k) - gOff) % mod == 0)
        out.add(UTF8String.fromBytes(bytes, gOff, offsets(i + w) - gOff))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class AnchorWindowsExpr(child: Expression, k: Int, w: Int, mod: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= k && mod >= 1,
    s"anchor_windows: need 1 <= k <= w and mod >= 1, got k=$k w=$w mod=$mod")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"anchor_windows requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "anchor_windows"
  override protected def nullSafeEval(t: Any): Any =
    AnchorWindows.eval(t.asInstanceOf[UTF8String], k, w, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.expressions.AnchorWindows.eval($t, $k, $w, $mod)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
