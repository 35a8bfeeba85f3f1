package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression computing the full MinHash-LSH band
  * signature of a document in ONE tight JVM loop:
  * tokenize → distinct k-shingles → per-shingle base hash → NumHashes
  * salted minima → NumBands band hashes.
  *
  * Why an Expression (ladder step (b), SURVEY §7.3): the equivalent
  * built-in pipeline (split / transform / concat_ws / array_min ×12) is
  * correct but interpreted — higher-order functions are CodegenFallback
  * and re-walk deep expression trees per element; profiling at sf0.1
  * put the sketch at ~4s of the bench. This expression does the same
  * arithmetic allocation-light and exposes `doGenCode`, so the
  * enclosing projection stays inside whole-stage codegen (a static
  * call, not a UDF's Row boxing).
  *
  * Hash basis ([[Md5Hash64]], = DuckDB `md5_number_lower` masked to 63
  * bits): every stage is recomputable in plain SQL, so the q42 oracle
  * replays the ENTIRE pipeline — signatures, bands, bucket caps,
  * candidates — instead of settling for a rows-only gate. The salt and
  * band mixes hash small decimal strings ("s:h", "b:m0,m1,m2") because
  * a decimal string is the one representation both engines produce
  * identically with zero casting ambiguity:
  *   minhash_s   = md5_63( s ":" base )     over distinct shingle bases
  *   band_b      = md5_63( b ":" m0 "," m1 "," ... )
  */
object MinHashBands {

  /** Static entry point referenced from generated code. */
  def compute(text: UTF8String, k: Int, numHashes: Int, numBands: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    // distinct shingle BASE hashes; dedup by base is equivalent to dedup
    // by string for the minima (min ignores duplicates; a 63-bit
    // collision feeds the same downstream values on both engines anyway)
    val shingleHashes = new java.util.HashSet[java.lang.Long]()
    if (words.length < k) {
      shingleHashes.add(Md5Hash64.lower63(text.toString))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        shingleHashes.add(Md5Hash64.lower63(sb.toString))
        i += 1
      }
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(32)
    val it = shingleHashes.iterator()
    while (it.hasNext) {
      val h = it.next().longValue()
      var s = 0
      while (s < numHashes) {
        sb.setLength(0)
        sb.append(s).append(':').append(h)
        val v = Md5Hash64.lower63(sb.toString)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    val rowsPerBand = numHashes / numBands
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      sb.setLength(0)
      sb.append(b).append(':')
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      bands(b) = Md5Hash64.lower63(sb.toString)
      b += 1
    }
    new GenericArrayData(bands)
  }
}

case class MinHashBandsExpr(child: Expression, k: Int, numHashes: Int,
    numBands: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[UTF8String], k, numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashBands.compute($c, $k, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
