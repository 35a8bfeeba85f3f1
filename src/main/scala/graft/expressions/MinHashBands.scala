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
  * candidates — instead of settling for a rows-only gate.
  *
  * Each shingle is MD5-hashed ONCE; the per-salt values are cheap
  * bijective mixes of that base (rotate + xor a salt constant), not
  * fresh digests — the r5 form digested every shingle numHashes+1
  * times and MD5 arithmetic was 44% of q42's runtime. Rotate-xor is a
  * bijection of the base hash (same dispersion for the min), uses only
  * operators DuckDB also has (masked shifts, xor), and keeps every
  * value sign-bit-masked so Spark's signed and DuckDB's unsigned
  * comparisons order identically:
  *   base        = md5_63( shingle )        (distinct per document)
  *   minhash_s   = min over bases of
  *                 ( rotl64(base, 5s+3) XOR md5_63("salt:" s) ) & MAX63
  *   band_b      = md5_63( b ":" m0 "," m1 "," ... )
  * The band mix hashes a small decimal string because that is the one
  * representation both engines produce identically with zero casting
  * ambiguity (it is per-document, not per-shingle, so its MD5 cost is
  * noise).
  */
object MinHashBands {

  /** Per-salt xor constants, fixed by the same MD5 basis the oracle
    * replays. Rotation distances 5s+3 stay in [3, 58] for s ≤ 11, so a
    * masked-shift rotl never degenerates (r=0) or overflows DuckDB's
    * checked `<<`; [[MinHashBandsExpr]] enforces the salt bound. */
  val MaxNumHashes = 12
  private val SaltXor: Array[Long] =
    Array.tabulate(MaxNumHashes)(s => Md5Hash64.lower63("salt:" + s))

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
        val v = (java.lang.Long.rotateLeft(h, 5 * s + 3) ^ SaltXor(s)) &
          Long.MaxValue
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
  require(numHashes >= 1 && numHashes <= MinHashBands.MaxNumHashes,
    s"numHashes must be in [1, ${MinHashBands.MaxNumHashes}] " +
      s"(got $numHashes): the salt family is sized for 12 rotations")

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
