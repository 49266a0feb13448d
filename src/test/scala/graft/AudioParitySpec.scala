package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** The direct RIFF/WAVE chunk walk ([[Multimodal.wavPcmBytesDirect]], the
  * hot path) must return byte-identical PCM to the JDK codec
  * ([[Multimodal.wavPcmBytes]], the reference) — the codec-parity proof
  * that lets the decode loop skip per-blob AudioSystem SPI dispatch.
  */
class AudioParitySpec extends SparkSpec {

  test("direct RIFF parse ≡ AudioSystem decode on every generated clip") {
    val wavs = Multimodal.mmAudio(spark, sf).collect()
    assert(wavs.nonEmpty)
    for (r <- wavs) {
      val blob = r.getAs[Array[Byte]](1)
      val ref = Multimodal.wavPcmBytes(blob)
      val got = Multimodal.wavPcmBytesDirect(blob)
      assert(java.util.Arrays.equals(ref, got),
        s"doc ${r.getLong(0)}: direct parse diverges from the JDK codec")
    }
  }

  test("direct parse rejects malformed containers loudly") {
    val wav = Multimodal.mmAudio(spark, sf).head().getAs[Array[Byte]](1)
    // stereo fmt: flip channels field (offset 12+8+2=22 in the canonical
    // JDK layout: RIFF(12) + fmt header(8) + audioFormat(2) -> channels)
    val stereo = wav.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Multimodal.wavPcmBytesDirect(stereo))
    val noRiff = wav.clone(); noRiff(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.wavPcmBytesDirect(noRiff))
    val truncated = java.util.Arrays.copyOf(wav, wav.length - 8)
    intercept[IllegalArgumentException](Multimodal.wavPcmBytesDirect(truncated))
    // Crafted chunk size near Int.MaxValue: int bound arithmetic would
    // overflow negative and slip past the truncation require — the
    // Long-math guard must reject it with the same loud contract error.
    val overflow = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(overflow)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, Int.MaxValue - 4) // fmt chunk size -> pos+8+size wraps
    val e = intercept[IllegalArgumentException](
      Multimodal.wavPcmBytesDirect(overflow))
    assert(e.getMessage.contains("truncated chunk"))
  }
}
