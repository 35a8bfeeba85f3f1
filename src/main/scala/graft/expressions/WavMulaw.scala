package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** G.711 µ-LAW companded audio (RIFF wFormatTag 7) — the logarithmic
  * 8-bit telephony codec, closing the companded-format box next to
  * uncompressed PCM16 ([[WavPcm16]]) and adaptive-differential ADPCM
  * ([[WavImaAdpcm]]). Decode is STATELESS per byte (each code expands
  * independently to the canonical 16-bit reconstruction level, the
  * ±32124 table): code c → u = ~c, magnitude
  * (mantissa << (exp+3)) + (132 << exp) − 132, sign from bit 7 of u —
  * all integer, so the oracle replays every sample from payload hex
  * with plain per-byte arithmetic (no fold: statelessness is the
  * format's defining contrast with ADPCM's running predictor).
  *
  * [[WavMulaw.encode]] packs payload bytes verbatim as the µ-law data
  * chunk (1 byte = 1 sample — the companded format's 2:1 size ratio vs
  * PCM16 is structural); [[WavMulaw.samples]] walks the RIFF chunk
  * list (same rules as WavPcm16: arbitrary chunk order, odd-size pad
  * bytes, declared-extent bounds), validates the fmt contract
  * (format 7, mono, 8-bit), and expands the codes. Malformed
  * containers are REJECTED with a descriptive error, not sliced. */
object WavMulaw {

  import LeBytes.readU16

  /** Build a valid mono µ-law WAV whose data chunk is `payload`. */
  def encode(payload: Array[Byte], sampleRate: Int): Array[Byte] =
    LeBytes.g711Wav(payload, sampleRate, 7) // format 7: µ-law

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"wav_mulaw: $msg")

  private def findChunk(wav: Array[Byte], id: String): (Int, Int) =
    LeBytes.findWavChunk(wav, id, fail)

  /** The canonical per-code expansion (Sun g711 ulaw2linear — the
    * ±32124 16-bit reconstruction table, computed not tabulated). */
  @inline def expand(code: Int): Int = {
    val u = (~code) & 0xff
    val e = (u >> 4) & 7
    val mag = ((u & 0x0f) << (e + 3)) + (132 << e) - 132
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Decode the sample array: one expanded 16-bit value per data
    * byte, after the fmt contract check (format 7, mono, 8-bit). */
  def samples(wav: Array[Byte]): ArrayData = {
    val (fmtOff, fmtSize) = findChunk(wav, "fmt ")
    if (fmtSize < 16) fail(s"fmt chunk too short ($fmtSize bytes)")
    val fmt = readU16(wav, fmtOff)
    if (fmt != 7) fail(s"not mu-law (audio format $fmt)")
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

case class WavMulawEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_mulaw_encode requires (binary, int), got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_mulaw_encode"
  override protected def nullSafeEval(p: Any, r: Any): Any =
    WavMulaw.encode(p.asInstanceOf[Array[Byte]], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.expressions.WavMulaw.encode($p, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class WavMulawSamplesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_mulaw_samples requires a binary input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wav_mulaw_samples"
  override protected def nullSafeEval(t: Any): Any =
    WavMulaw.samples(t.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.WavMulaw.samples($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
