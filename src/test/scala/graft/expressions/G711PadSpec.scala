package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

/** r16 advice #2: RIFF requires word-aligned chunks — an odd G.711
  * data payload must gain a zero pad byte (counted by the RIFF extent,
  * NOT by the data chunk size) so strict external WAV readers accept
  * the encoder's output. */
class G711PadSpec extends AnyFunSuite {

  test("g711Wav pads an odd data payload to a word boundary and the " +
    "declared RIFF extent covers the pad") {
    val wav = LeBytes.g711Wav(
      Array[Byte](1, 2, 3), 8000, 7)
    assert(wav.length % 2 == 0, "odd-payload file must end word-aligned")
    assert(LeBytes.readU32(wav, 4) == wav.length - 8,
      "RIFF extent must cover the pad byte")
    val (off, size) = LeBytes.findWavChunk(
      wav, "data", m => fail(m))
    assert(size == 3, "data chunk size must NOT count the pad")
    assert(wav(off + 3) == 0, "pad byte is zero")
    // even payload: unchanged layout, no pad
    val even = LeBytes.g711Wav(
      Array[Byte](1, 2, 3, 4), 8000, 7)
    assert(even.length == wav.length)
  }

}
