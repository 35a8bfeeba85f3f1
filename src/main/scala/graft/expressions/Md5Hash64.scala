package graft.expressions

import java.nio.charset.StandardCharsets

/** 64-bit hash derived from MD5, bit-compatible with DuckDB's
  * `md5_number_lower(expr)`: the little-endian u64 of digest bytes
  * 8..15, carried as the same 64 bits in a signed JVM Long.
  *
  * Why MD5 and not xxhash64 for the LSH sketches: the ORACLE needs to
  * recompute the sketch. DuckDB has no xxhash64, but both engines agree
  * on md5 of the same UTF-8 bytes, which makes the whole MinHash/SimHash
  * pipeline (signatures → bands → buckets → candidates) expressible as
  * plain SQL on the oracle side — upgrading the LSH family from
  * rows-only gates to full hash-compared oracles. MD5 on short inputs is
  * ~2-3× slower than xxhash64 but still millions/sec/core; the sketch
  * stays a per-row narrow projection either way.
  *
  * `lower63` masks the sign bit so values order identically under
  * Spark's signed Long comparison and DuckDB's BIGINT after the
  * equivalent `& 9223372036854775807` — MinHash minima compare the same
  * on both sides without unsigned-compare gymnastics.
  */
object Md5Hash64 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def assemble(d: Array[Byte]): Long =
    ((d(15) & 0xffL) << 56) | ((d(14) & 0xffL) << 48) |
      ((d(13) & 0xffL) << 40) | ((d(12) & 0xffL) << 32) |
      ((d(11) & 0xffL) << 24) | ((d(10) & 0xffL) << 16) |
      ((d(9) & 0xffL) << 8) | (d(8) & 0xffL)

  def lower64(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    assemble(m.digest(bytes))
  }

  /** Range form — hash `len` bytes at `off` without slicing a copy
    * (the AnchorWindows hot loop hashes one k-gram per position). */
  def lower64(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(bytes, off, len)
    assemble(m.digest())
  }

  def lower64(s: String): Long =
    lower64(s.getBytes(StandardCharsets.UTF_8))

  /** Sign-bit-masked variant: non-negative, = DuckDB
    * `(md5_number_lower(s) & 9223372036854775807)::BIGINT`. */
  def lower63(s: String): Long = lower64(s) & Long.MaxValue

  /** Range form of [[lower63]] — ONE definition of the sign-mask
    * convention for byte-range callers too. */
  def lower63(bytes: Array[Byte], off: Int, len: Int): Long =
    lower64(bytes, off, len) & Long.MaxValue
}
