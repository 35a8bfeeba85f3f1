package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Phrase REDACTION (qcj) — the deliverable the qch matcher exists
  * for: any text covered by any lexicon-phrase match is masked, with
  * overlapping matches merged into one masked island carrying the
  * category tag of the island-starting match (leftmost, then longest,
  * then lowest phrase id). The policy is deliberately the qbb span-cut
  * idiom re-used for redaction: islands from a running max over the
  * (start asc, len desc, pid asc) order, adjacency kept separate —
  * so the oracle can derive the SAME islands declaratively (window
  * running-max + lag gap-rebuild) while the engine does it in one
  * imperative pass inside the expression: two unrelated
  * implementations of one fixed semantics, the qcg gate shape.
  *
  * One automaton walk + one sort of the (small) match set per row;
  * gap bytes are copied directly from the input's UTF-8 — no
  * per-codepoint String work, no shuffle, the qch plan shape. */
final class PhraseRedactor(phrases: Array[String], tags: Array[String])
    extends Serializable {
  require(tags.length == phrases.length,
    "phrase_redact: one tag per phrase")
  private val auto = new PhraseAutomaton(phrases)
  private val tagBytes = tags.map(_.getBytes("UTF-8"))
  // tags are require()d printable ASCII, so codepoints == length
  private val tagCpLen = tags.map(_.length)

  def redact(text: UTF8String): org.apache.spark.sql.catalyst
      .expressions.GenericInternalRow =
    auto.redact(text, tagBytes, tagCpLen)
}

object PhraseRedact {
  /** One redactor per distinct (phrases, tags) pair per JVM — the
    * same caching discipline as PhraseMatch.automaton; the U+0000
    * joiner cannot collide because both halves are require()d
    * printable ASCII. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, PhraseRedactor]()

  def redactor(phraseSpec: String, tagSpec: String): PhraseRedactor =
    cache.computeIfAbsent(phraseSpec + "\u0000" + tagSpec,
      _ => new PhraseRedactor(phraseSpec.split('|'), tagSpec.split('|')))
}

case class PhraseRedactExpr(child: Expression, phrases: Seq[String],
    tags: Seq[String]) extends UnaryExpression {
  require(phrases.nonEmpty, "phrase_redact: empty phrase list")
  require(tags.length == phrases.length,
    "phrase_redact: one tag per phrase")
  // same printability contract as phrase_matches (the spec doubles as
  // the cache key); the packed-long match sort bounds phrase length
  // and count at 0xFFFF — far above any real lexicon entry
  private def asciiOk(s: String): Boolean =
    s.nonEmpty && s.forall(c =>
      c >= 0x20 && c <= 0x7e && c != '|' && c != '"' && c != '\\')
  require(phrases.forall(asciiOk) && tags.forall(asciiOk),
    "phrase_redact: phrases/tags must be printable ASCII without | \" \\")
  require(phrases.length < 0xFFFF && phrases.forall(_.length < 0xFFFF),
    "phrase_redact: phrase list exceeds the packed-match bounds")

  private def phraseSpec: String = phrases.mkString("|")
  private def tagSpec: String = tags.mkString("|")

  @transient private lazy val red =
    PhraseRedact.redactor(phraseSpec, tagSpec)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_redact requires a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("red", StringType, nullable = false),
    StructField("n_islands", LongType, nullable = false),
    StructField("chars_masked", LongType, nullable = false),
    StructField("tag_chars", LongType, nullable = false)))

  override def prettyName: String = "phrase_redact"

  override protected def nullSafeEval(input: Any): Any =
    red.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the compiled redactor (automaton + tag bytes) ships with the
    // plan as one reference object — zero per-row lookup
    val ref = ctx.addReferenceObj("phraseRedactor", red,
      classOf[PhraseRedactor].getName)
    defineCodeGen(ctx, ev, c => s"$ref.redact($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
