package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real audio parser at the multimodal decoder seam (q181):
  * RIFF/WAVE chunk walking per spec — unknown chunks skipped with the
  * pad-to-even rule (so the data offset is NOT the canonical 44), fmt
  * validated as PCM/mono/16-bit before data is accepted, samples
  * decoded signed little-endian — and the lenient-ingest contract on
  * everything malformed.
  */
class WavDecodeSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def fmtBody(audioFormat: Int = 1, channels: Int = 1,
      sr: Int = 8000, bits: Int = 16): Array[Byte] =
    le16(audioFormat) ++ le16(channels) ++ le32(sr) ++
      le32(sr * channels * bits / 8) ++ le16(channels * bits / 8) ++
      le16(bits)

  private def pcm(samples: Seq[Int]): Array[Byte] =
    samples.toArray.flatMap(s => le16(s & 0xffff))

  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WAVE".getBytes("US-ASCII") ++ chunks.flatten
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private val tone = Seq(0, 1000, -1000, 32767, -32768, -1)

  test("canonical fmt+data container decodes signed samples exactly") {
    val Some((sr, smp)) =
      Multimodal.decodeWav(wav(chunk("fmt ", fmtBody(sr = 12000)),
        chunk("data", pcm(tone))))
    assert(sr === 12000)
    assert(smp.toSeq === tone)
  }

  test("unknown chunks before data are skipped — data offset is not 44") {
    val lst = chunk("LIST", "INFOabcd".getBytes("US-ASCII"))
    val Some((_, smp)) = Multimodal.decodeWav(
      wav(chunk("fmt ", fmtBody()), lst, chunk("data", pcm(tone))))
    assert(smp.toSeq === tone,
      "a parser assuming the canonical 44-byte header would misread every sample")
  }

  test("odd-sized unknown chunks consume their pad byte (RIFF even rule)") {
    val odd = chunk("LIST", "INFOx".getBytes("US-ASCII")) // 5-byte body + pad
    assert(odd.length % 2 === 0)
    val Some((_, smp)) = Multimodal.decodeWav(
      wav(chunk("fmt ", fmtBody()), odd, chunk("data", pcm(tone))))
    assert(smp.toSeq === tone)
  }

  test("malformed containers are None, never a crash or garbage samples") {
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxAVI ".getBytes).isEmpty,
      "wrong form type")
    assert(Multimodal.decodeWav(
      wav(chunk("data", pcm(tone)), chunk("fmt ", fmtBody()))).isEmpty,
      "data before fmt: samples cannot be validated")
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmtBody(audioFormat = 3)),
        chunk("data", pcm(tone)))).isEmpty, "IEEE-float fmt unsupported")
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmtBody(channels = 2)),
        chunk("data", pcm(tone)))).isEmpty, "stereo unsupported")
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmtBody(bits = 8)),
        chunk("data", pcm(tone)))).isEmpty, "8-bit unsupported")
    val truncated = wav(chunk("fmt ", fmtBody()), chunk("data", pcm(tone)))
      .dropRight(3)
    assert(Multimodal.decodeWav(truncated).isEmpty, "truncated data chunk")
    val oddData = wav(chunk("fmt ", fmtBody()),
      "data".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3, 0))
    assert(Multimodal.decodeWav(oddData).isEmpty,
      "odd data size cannot be 16-bit samples")
  }

  test("adversarial chunk sizes overflow to None, not OOM (round-12 fix)") {
    // declared size 0x7ffffff0: body+sz wraps negative in Int, so the
    // pre-fix bound check passed and sz/2 drove a ~1 GB allocation
    val huge = wav(chunk("fmt ", fmtBody()),
      "data".getBytes("US-ASCII") ++ le32(0x7ffffff0) ++ Array[Byte](1, 2))
    assert(Multimodal.decodeWav(huge).isEmpty,
      "declared-size overflow must read as truncated")
    // same wrap on a skipped unknown chunk
    val hugeSkip = wav(
      "LIST".getBytes("US-ASCII") ++ le32(0x7ffffffc) ++ Array[Byte](9),
      chunk("fmt ", fmtBody()), chunk("data", pcm(tone)))
    assert(Multimodal.decodeWav(hugeSkip).isEmpty)
  }

  test("the q181 fixture round-trips through the parser end-to-end") {
    val spark = SparkSpec.session
    val rows = SparkEntry.queries("q181_wav_decode")(
      spark, "/root/testdata/sf0.001")
    val got = rows.groupBy().count().collect()(0).getLong(0)
    // every doc decodes (no None drops): frames = Σ n/32 over docs
    import org.apache.spark.sql.functions._
    val want = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(((lit(128) + pmod(col("doc_id"), lit(5)) * 64) / 32)
        .cast("long").as("f"))
      .agg(sum("f")).collect()(0).getLong(0)
    assert(got === want, "a decode failure would silently drop frames")
  }

  test("q185 catches every single-sample-edited probe (pigeonhole recall)") {
    val spark = SparkSpec.session
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q185_audio_neardup")(
      spark, "/root/testdata/sf0.001")
    val caught = pairs.filter(col("b") === col("a") + 1000000L).count()
    val probes = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 17 === 0).count()
    assert(caught === probes,
      "one edited sample moves <= 2 dHash bits; every probe must pair")
  }
}
