package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-phrase matcher — the qcf single-word lexicon
  * gate's documented next step (real safety/PII term lists are
  * overwhelmingly multi-WORD phrases, which an `isin` over the token
  * array cannot express). One automaton walk per document finds EVERY
  * occurrence of every phrase simultaneously — overlapping matches,
  * shared-prefix phrases (a short phrase that is a prefix of a longer
  * one is reported at its own end position even mid-way through the
  * longer match, via the merged suffix-link outputs), and
  * self-overlapping repeats ("dup dup" twice inside "dup dup dup")
  * all included — in O(codepoints + matches), independent of lexicon
  * size. A scan-then-`contains` per phrase would be O(phrases × text)
  * and still miss positions.
  *
  * Positions are 1-based CODEPOINT indices of each match START — the
  * exact arithmetic DuckDB's `substr`/`length` use, so the oracle can
  * replay every position with a per-position comprehension and the
  * gate is positional, not just count-level.
  *
  * The walk decodes codepoints directly from the UTF8String's bytes
  * (Spark guarantees valid UTF-8): no `toString`, no char-array copy,
  * on ANY row — the per-row cost is one byte scan whether the text is
  * clean ASCII or not. The compiled automaton rides the plan as a
  * codegen reference object (built once on the driver, shipped with
  * the task like a broadcast literal), so a production 10³-phrase
  * lexicon costs one trie in executor memory — never a shuffle, never
  * a per-row lookup. */
final class PhraseAutomaton(val phrases: Array[String])
    extends Serializable {
  require(phrases.nonEmpty, "phrase_matches: empty phrase list")

  private val phraseCp: Array[Array[Int]] =
    phrases.map(p => p.codePoints().toArray)
  /** codepoint length per phrase — start = end - cpLen + 1. */
  private val cpLen: Array[Int] = phraseCp.map(_.length)

  // trie: per-node codepoint -> next-node map. Boxed Integer keys on
  // purpose: Scala's HashMap[Int, Int] erases to Object and get()
  // would unbox an absent key's null to 0 (= the root) silently.
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Integer, Integer]())
  private val ownOut =
    scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  for ((cps, pid) <- phraseCp.zipWithIndex) {
    var cur = 0
    for (cp <- cps) {
      val next = gotoMaps(cur).get(Integer.valueOf(cp))
      cur = if (next == null) {
        gotoMaps += new java.util.HashMap[Integer, Integer]()
        ownOut += Nil
        gotoMaps(cur).put(cp, gotoMaps.size - 1)
        gotoMaps.size - 1
      } else next.intValue()
    }
    ownOut(cur) = pid :: ownOut(cur)
  }

  private val fail = new Array[Int](gotoMaps.size)
  /** Merged outputs: out(v) = own(v) ++ out(fail(v)), precomputed in
    * BFS order so emission is one array walk, no suffix-link chase. */
  private val out = new Array[Array[Int]](gotoMaps.size)
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    out(0) = ownOut(0).toArray
    gotoMaps(0).forEach { (_, v) =>
      fail(v) = 0
      out(v) = (ownOut(v) ++ out(0)).toArray
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (cp, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(cp)) f = fail(f)
        val fv = gotoMaps(f).getOrDefault(cp, Integer.valueOf(0))
          .intValue()
        fail(v) = if (fv == v.intValue()) 0 else fv
        out(v) = (ownOut(v) ++ out(fail(v))).toArray
        queue.add(v)
      }
    }
  }

  /** One automaton pass; returns the result struct's backing row:
    * (n_matches, pos_sum = Σ (pid+1)·start², first_pos = min start or
    * 0, counts[pid]). */
  def run(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    val counts = new Array[Long](phrases.length)
    var nMatches = 0L
    var posSum = 0L
    var firstPos = 0L
    var cur = 0
    var i = 0
    var pos = 0 // 1-based codepoint index of the codepoint just read
    while (i < bytes.length) {
      val n = UTF8String.numBytesForFirstByte(bytes(i))
      val cp = n match {
        case 1 => bytes(i) & 0x7f
        case 2 => ((bytes(i) & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        case 3 => ((bytes(i) & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        case _ => ((bytes(i) & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
      }
      i += n
      pos += 1
      val key = Integer.valueOf(cp)
      var next = gotoMaps(cur).get(key)
      while (next == null && cur != 0) {
        cur = fail(cur)
        next = gotoMaps(cur).get(key)
      }
      cur = if (next == null) 0 else next.intValue()
      val o = out(cur)
      var k = 0
      while (k < o.length) {
        val pid = o(k)
        val start = pos - cpLen(pid) + 1
        counts(pid) += 1
        nMatches += 1
        posSum += (pid + 1).toLong * start * start
        if (firstPos == 0L || start < firstPos) firstPos = start
        k += 1
      }
    }
    val row = new GenericInternalRow(4)
    row.setLong(0, nMatches)
    row.setLong(1, posSum)
    row.setLong(2, firstPos)
    row.update(3, new GenericArrayData(counts))
    row
  }

  /** The redaction walk (qcj): the same automaton pass, but every
    * match is COLLECTED, overlapping matches merge into maximal
    * ISLANDS (gaps-and-islands on the (start asc, len desc, pid asc)
    * order — the running max end; adjacency does NOT merge), and each
    * island is replaced by the tag of its island-STARTING match. One
    * pass over the bytes plus one sort of the (small) match set; the
    * rebuild copies gap bytes directly — no per-codepoint String
    * work. Returns (red, n_islands, chars_masked, tag_chars); the
    * caller's length identity red_len = len − masked + tag_chars
    * holds by construction and rides the result as data.
    *
    * Match packing: start(32) | (0xFFFF − cpLen)(16) | pid(16), so a
    * plain ascending long sort IS the (start asc, len desc, pid asc)
    * policy order. Bounds are require()d at expression construction
    * (phrases < 65,535 codepoints, < 65,535 phrases). */
  def redact(text: UTF8String, tagBytesByPid: Array[Array[Byte]],
      tagCpLenByPid: Array[Int]): GenericInternalRow = {
    val bytes = text.getBytes
    // byte offset where each 1-based codepoint starts; offsets(nCp+1)
    // = bytes.length closes the last codepoint (nCp <= bytes.length)
    val offsets = new Array[Int](bytes.length + 2)
    val buf = new scala.collection.mutable.ArrayBuffer[Long]()
    var cur = 0
    var i = 0
    var pos = 0
    while (i < bytes.length) {
      pos += 1
      offsets(pos) = i
      val n = UTF8String.numBytesForFirstByte(bytes(i))
      val cp = n match {
        case 1 => bytes(i) & 0x7f
        case 2 => ((bytes(i) & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        case 3 => ((bytes(i) & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        case _ => ((bytes(i) & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
      }
      i += n
      val key = Integer.valueOf(cp)
      var next = gotoMaps(cur).get(key)
      while (next == null && cur != 0) {
        cur = fail(cur)
        next = gotoMaps(cur).get(key)
      }
      cur = if (next == null) 0 else next.intValue()
      val o = out(cur)
      var k = 0
      while (k < o.length) {
        val pid = o(k)
        val start = pos - cpLen(pid) + 1
        buf += (start.toLong << 32) |
          ((0xFFFFL - cpLen(pid)) << 16) | pid.toLong
        k += 1
      }
    }
    offsets(pos + 1) = bytes.length
    val ms = buf.toArray
    java.util.Arrays.sort(ms)
    val outBytes = new java.io.ByteArrayOutputStream(bytes.length)
    var nIslands = 0L
    var masked = 0L
    var tagChars = 0L
    var islandStart = 0
    var islandEnd = 0
    var islandPid = -1
    var copiedUpTo = 1 // next 1-based codepoint not yet emitted
    def flushIsland(): Unit = if (islandPid >= 0) {
      outBytes.write(bytes, offsets(copiedUpTo),
        offsets(islandStart) - offsets(copiedUpTo))
      val tb = tagBytesByPid(islandPid)
      outBytes.write(tb, 0, tb.length)
      nIslands += 1
      masked += islandEnd - islandStart + 1
      tagChars += tagCpLenByPid(islandPid)
      copiedUpTo = islandEnd + 1
    }
    var k = 0
    while (k < ms.length) {
      val m = ms(k)
      val start = (m >>> 32).toInt
      val len = 0xFFFF - ((m >>> 16) & 0xFFFFL).toInt
      val pid = (m & 0xFFFFL).toInt
      val end = start + len - 1
      if (islandPid < 0) {
        islandStart = start; islandEnd = end; islandPid = pid
      } else if (start <= islandEnd) {
        if (end > islandEnd) islandEnd = end
      } else {
        flushIsland()
        islandStart = start; islandEnd = end; islandPid = pid
      }
      k += 1
    }
    flushIsland()
    outBytes.write(bytes, offsets(copiedUpTo),
      bytes.length - offsets(copiedUpTo))
    val row = new GenericInternalRow(4)
    row.update(0, UTF8String.fromBytes(outBytes.toByteArray))
    row.setLong(1, nIslands)
    row.setLong(2, masked)
    row.setLong(3, tagChars)
    row
  }
}

object PhraseMatch {
  /** One compiled automaton per distinct phrase list per JVM — the
    * interpreted (non-codegen) path looks the trie up here; the
    * codegen path carries it as a plan reference object instead. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, PhraseAutomaton]()

  def automaton(spec: String): PhraseAutomaton =
    cache.computeIfAbsent(spec,
      s => new PhraseAutomaton(s.split('|')))
}

case class PhraseMatchExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  // the spec doubles as the automaton cache key — keep it trivially
  // printable (ASCII, no separator/quote chars) so specs and plans
  // stay readable
  require(phrases.nonEmpty, "phrase_matches: empty phrase list")
  require(phrases.forall(p => p.nonEmpty && p.forall(c =>
    c >= 0x20 && c <= 0x7e && c != '|' && c != '"' && c != '\\')),
    "phrase_matches: phrases must be printable ASCII without | \" \\")

  private def spec: String = phrases.mkString("|")

  @transient private lazy val auto = PhraseMatch.automaton(spec)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_matches requires a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_matches", LongType, nullable = false),
    StructField("pos_sum", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "phrase_matches"

  override protected def nullSafeEval(input: Any): Any =
    auto.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the compiled automaton ships with the plan as a reference
    // object — zero per-row lookup, one trie per task closure
    val ref = ctx.addReferenceObj("phraseAutomaton", auto,
      classOf[PhraseAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
