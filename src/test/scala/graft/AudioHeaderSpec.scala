package graft

import graft.operators.Multimodal
import graft.plans.{AudioHeaders, AudioMeta}
import org.apache.spark.sql.functions._

/** The audio header parser against hand-assembled container bytes:
  * RIFF chunk walking (extra chunks, odd-size padding), FLAC
  * STREAMINFO bit boundaries, and NULL (never an exception) on
  * garbage/truncation. */
class AudioHeaderSpec extends SparkSpecBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def meta(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] =
    Option(AudioHeaders.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))

  // canonical 2-channel 44100 Hz 16-bit WAV, 1000 samples (4000 bytes)
  private val wav = "52494646 24100000 57415645" +
    "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
    "64617461 A00F0000"

  test("WAV fmt chunk: channels, rate, bits, samples from data size") {
    assert(meta(hex(wav)).contains(("wav", 2, 44100, 16, 1000L)))
  }

  test("WAV chunk walk skips unknown chunks and honors odd-size padding") {
    // a LIST chunk of ODD size 5 (padded to 6) sits before fmt/data
    val listed = "52494646 36100000 57415645" +
      "4C495354 05000000 494E464F 41 00" + // "LIST", size 5, + pad byte
      "666D7420 10000000 0100 0100 803E0000 007D0000 0200 1000" +
      "64617461 E8030000" // 1000 bytes / align 2 = 500 samples
    assert(meta(hex(listed)).contains(("wav", 1, 16000, 16, 500L)))
  }

  test("FLAC STREAMINFO: 20/3/5/36-bit boundaries unpack correctly") {
    // rate 44100 (0x0AC44), ch 2 (=1+1), bits 16 (=15+1), n 123456789
    // packed: 0AC44 | 001 | 01111 | 000000075BCD15
    val packed = java.lang.Long.toHexString(
      (44100L << 44) | (1L << 41) | (15L << 36) | 123456789L)
    val flac = "664C6143 00000022 10001000 000000 000000" +
      ("0" * (16 - packed.length)) + packed + ("0" * 32)
    assert(meta(hex(flac)).contains(("flac", 2, 44100, 16, 123456789L)))
  }

  test("garbage, truncation, and non-audio bytes yield null, not errors") {
    assert(meta(Array[Byte]()).isEmpty)
    assert(meta("definitely not audio bytes".getBytes).isEmpty)
    assert(meta(hex("52494646 24100000 57415645")).isEmpty) // no fmt chunk
    assert(meta(hex("664C6143 00000022 1000")).isEmpty)     // truncated FLAC
    // WAV whose fmt chunk runs past the buffer
    assert(meta(hex("52494646 24100000 57415645 666D7420 10000000 0100"))
      .isEmpty)
  }

  test("the expression evaluates identically interpreted and codegen'd") {
    val media = Multimodal.synthAudioTable(Tables.documents(spark, sf))
    def run(codegen: String): Array[(Long, String, Int, Int, Int, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try media.select(col("doc_id"), AudioMeta(col("media")).as("m"))
        .select(col("doc_id"), col("m.format"), col("m.channels"),
          col("m.sample_rate"), col("m.bits_per_sample"), col("m.n_samples"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getLong(5)))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val a = run("CODEGEN_ONLY")
    val b = run("NO_CODEGEN")
    assert(a.nonEmpty && a.sameElements(b))
    assert(a.forall(t => t._2 == "wav" || t._2 == "flac"))
  }
}
