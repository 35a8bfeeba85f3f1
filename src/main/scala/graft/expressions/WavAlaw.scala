package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** G.711 A-LAW companded audio (RIFF wFormatTag 6) — the European
  * telephony companion to µ-law ([[WavMulaw]]), closing BOTH branches
  * of the companded-format box. Same stateless 1-byte-per-sample
  * structure, different transfer curve: code c → u = c ^ 0x55 (the
  * even-bit inversion the wire format mandates), segment
  * s = (u >> 4) & 7, mantissa m = u & 0x0f, magnitude
  * (m << 4) + 8 for segment 0 and ((m << 4) + 0x108) << (s − 1)
  * otherwise, sign POSITIVE when bit 7 of u is set (the opposite
  * polarity convention from µ-law — one of the two laws' genuinely
  * asymmetric details, pinned by the cross-law L1 gate in q8n). The
  * reconstruction range is ±32256 (vs µ-law's ±32124) and the curve is
  * linear-with-offset in segment 0 instead of µ-law's everywhere-
  * logarithmic bias-132 form — all integer, so every sample replays in
  * DuckDB from payload hex with plain per-byte arithmetic.
  *
  * [[WavAlaw.encode]] packs payload bytes verbatim as the A-law data
  * chunk; [[WavAlaw.samples]] walks the RIFF chunk list (same rules as
  * WavPcm16/WavMulaw: arbitrary chunk order, odd-size pad bytes,
  * declared-extent bounds), validates the fmt contract (format 6,
  * mono, 8-bit), and expands the codes. Malformed containers are
  * REJECTED with a descriptive error, not sliced. */
object WavAlaw {

  import LeBytes.readU16

  /** Build a valid mono A-law WAV whose data chunk is `payload`. */
  def encode(payload: Array[Byte], sampleRate: Int): Array[Byte] =
    LeBytes.g711Wav(payload, sampleRate, 6) // format 6: A-law

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"wav_alaw: $msg")

  private def findChunk(wav: Array[Byte], id: String): (Int, Int) =
    LeBytes.findWavChunk(wav, id, fail)

  /** The canonical per-code expansion (Sun g711 alaw2linear — the
    * ±32256 16-bit reconstruction table, computed not tabulated). */
  @inline def expand(code: Int): Int = {
    val u = (code ^ 0x55) & 0xff
    val s = (u >> 4) & 7
    val mag =
      if (s == 0) ((u & 0x0f) << 4) + 8
      else (((u & 0x0f) << 4) + 0x108) << (s - 1)
    if ((u & 0x80) != 0) mag else -mag
  }

  /** Decode the sample array: one expanded 16-bit value per data
    * byte, after the fmt contract check (format 6, mono, 8-bit). */
  def samples(wav: Array[Byte]): ArrayData = {
    val (fmtOff, fmtSize) = findChunk(wav, "fmt ")
    if (fmtSize < 16) fail(s"fmt chunk too short ($fmtSize bytes)")
    val fmt = readU16(wav, fmtOff)
    if (fmt != 6) fail(s"not A-law (audio format $fmt)")
    val channels = readU16(wav, fmtOff + 2)
    if (channels != 1) fail(s"expected mono, got $channels channels")
    val bits = readU16(wav, fmtOff + 14)
    if (bits != 8) fail(s"expected 8-bit codes, got $bits")
    val (off, size) = findChunk(wav, "data")
    val out = new Array[Int](size)
    var i = 0
    while (i < size) {
      out(i) = expand(wav(off + i) & 0xff)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WavAlawEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_alaw_encode requires (binary, int), got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_alaw_encode"
  override protected def nullSafeEval(p: Any, r: Any): Any =
    WavAlaw.encode(p.asInstanceOf[Array[Byte]], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.expressions.WavAlaw.encode($p, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class WavAlawSamplesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_alaw_samples requires a binary input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wav_alaw_samples"
  override protected def nullSafeEval(t: Any): Any =
    WavAlaw.samples(t.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.WavAlaw.samples($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
