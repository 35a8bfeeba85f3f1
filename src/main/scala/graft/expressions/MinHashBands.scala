package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression computing the full MinHash-LSH band
  * signature of a document in ONE tight JVM loop:
  * tokenize → distinct k-shingles → per-shingle xxhash64 → NumHashes
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
  * Bit-compatibility: uses Spark's own XXH64 with the same fold
  * semantics as the SQL `xxhash64(...)` function (seed 42, per-child
  * chaining), so results are identical to the expression chain it
  * replaces — DedupFixtureSpec passes unchanged.
  */
object MinHashBands {

  /** Static entry point referenced from generated code. */
  def compute(text: UTF8String, k: Int, numHashes: Int, numBands: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val shingleHashes = new java.util.HashSet[java.lang.Long]()
    if (words.length < k) {
      shingleHashes.add(hashUtf8(text.toString))
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
        shingleHashes.add(hashUtf8(sb.toString))
        i += 1
      }
    }
    // salted minima; salt seed chain matches xxhash64(lit(s), h)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val saltSeeds = Array.tabulate(numHashes)(s => XXH64.hashInt(s, 42L))
    val it = shingleHashes.iterator()
    while (it.hasNext) {
      val h = it.next().longValue()
      var s = 0
      while (s < numHashes) {
        val v = XXH64.hashLong(h, saltSeeds(s))
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    // band hash = xxhash64(mh_b0, mh_b1, ...): fold longs from seed 42
    val rowsPerBand = numHashes / numBands
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var seed = 42L
      var r = 0
      while (r < rowsPerBand) {
        seed = XXH64.hashLong(mins(b * rowsPerBand + r), seed)
        r += 1
      }
      bands(b) = seed
      b += 1
    }
    new GenericArrayData(bands)
  }

  private def hashUtf8(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
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
