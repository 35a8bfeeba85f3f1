package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Golden pins for the md5-derived 64-bit hash basis that five
  * full-replay oracles (q42/q43/q51/q59's planes, the sampling bucket
  * idiom) stand on. Every value below was computed INDEPENDENTLY twice
  * on 2026-08-12 and agreed byte-for-byte:
  *   - DuckDB 1.x: `SELECT md5_number_lower(s)::UBIGINT`
  *   - Python: `struct.unpack('<Q', hashlib.md5(s.encode()).digest()[8:16])`
  * The pinned numbers are the same 64 bits carried as a signed JVM
  * Long. If this spec fails, the LSH oracle family is silently broken.
  */
class Md5Hash64Spec extends AnyFunSuite {

  test("lower64 matches DuckDB md5_number_lower on pinned goldens") {
    val pins = Seq(
      "" -> 9098107892288553193L,
      "a" -> 7000413967451013937L,
      "hello world" -> -4337711292721476717L,
      "ünïcødé-✓" -> -5026364240352580087L,       // multi-byte UTF-8
      "salt:0" -> -5358070490150298641L,          // MinHash salt family
      "plane:0:0" -> 1332567010563279834L,        // q51 Rademacher planes
      "汉字 mixed ascii" -> 7245277636765205509L, // CJK
      "line\nbreak\ttab" -> 1655463429110659867L) // control chars
    pins.foreach { case (s, want) =>
      assert(Md5Hash64.lower64(s) == want,
        s"lower64(${s.take(20)}) drifted from the DuckDB/Python golden")
    }
  }

  test("lower63 is the sign-bit mask of lower64, always non-negative") {
    val inputs = Seq("", "a", "hello world", "ünïcødé-✓", "salt:7")
    inputs.foreach { s =>
      val l63 = Md5Hash64.lower63(s)
      assert(l63 == (Md5Hash64.lower64(s) & Long.MaxValue))
      assert(l63 >= 0L)
    }
  }
}
