package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real video parser at the multimodal decoder seam (q187):
  * YUV4MPEG2 per the mjpegtools convention — order-free header
  * tokens, FRAME marker lines (parameters tolerated), raw 4:2:0
  * planes with chroma skipped by arithmetic — and the lenient-ingest
  * contract on everything malformed.
  */
class Y4mDecodeSpec extends AnyFunSuite {

  private def clip(header: String, frames: Seq[Array[Byte]],
      marker: String = "FRAME"): Array[Byte] =
    (header + "\n").getBytes("US-ASCII") ++
      frames.flatMap(f => (marker + "\n").getBytes("US-ASCII") ++ f)

  // a 4x2 C420 frame: 8 luma + 2x(2x1) chroma = 12 bytes
  private def frame(seed: Int): Array[Byte] =
    Array.tabulate[Byte](12)(i => ((seed * 37 + i * 11) % 256).toByte)

  test("canonical header + two frames decode to exact luma planes") {
    val f0 = frame(1); val f1 = frame(2)
    val Some((w, h, lumas)) = Multimodal.decodeY4m(
      clip("YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420", Seq(f0, f1)))
    assert((w, h) === ((4, 2)))
    assert(lumas.length === 2)
    assert(lumas(0).toSeq === f0.take(8).toSeq, "luma only, chroma skipped")
    assert(lumas(1).toSeq === f1.take(8).toSeq)
  }

  test("order-free header tokens and FRAME parameters are tolerated") {
    val f0 = frame(3)
    val Some((w, h, lumas)) = Multimodal.decodeY4m(
      clip("YUV4MPEG2 C420mpeg2 H2 F30:1 W4", Seq(f0), marker = "FRAME Xt"))
    assert((w, h) === ((4, 2)))
    assert(lumas(0).toSeq === f0.take(8).toSeq)
  }

  test("malformed containers are None, never a crash or garbage planes") {
    assert(Multimodal.decodeY4m(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeY4m(
      clip("MPEG4 W4 H2", Seq(frame(1)))).isEmpty, "wrong magic")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W4 H2 C444", Seq(frame(1)))).isEmpty,
      "non-4:2:0 colourspace unsupported")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W3 H2", Seq(frame(1)))).isEmpty, "odd width")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 H2", Seq(frame(1)))).isEmpty, "missing width")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W4 H2", Seq(frame(1).take(10)))).isEmpty,
      "truncated plane")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W4 H2", Nil)).isEmpty, "zero frames")
    // header "YUV4MPEG2 W4 H2\n" is 16 bytes; the marker starts at 16
    val badMarker = clip("YUV4MPEG2 W4 H2", Seq(frame(1)))
      .patch(16, "FRUME".getBytes("US-ASCII"), 5)
    assert(Multimodal.decodeY4m(badMarker).isEmpty, "corrupt FRAME marker")
  }

  test("adversarial dimensions overflow to None, not a crash (round-12 fix)") {
    // 65536·65536 wraps w·h to 0 in Int — pre-fix every truncation
    // check passed and copyOfRange threw on the first frame
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W65536 H65536", Seq(frame(1)))).isEmpty,
      "w·h Int overflow must read as truncated, not zero-size planes")
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W2147483646 H2", Seq(frame(1)))).isEmpty)
    // dims whose digits overflow Int parse as invalid (-1) already —
    // keep the guard pinned
    assert(Multimodal.decodeY4m(
      clip("YUV4MPEG2 W99999999999 H2", Seq(frame(1)))).isEmpty)
  }

  test("q188 recovers the exact scene structure the fixture plants") {
    val spark = SparkSpec.session
    val rows = SparkEntry.queries("q188_scene_cuts")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.size === docs.length, "every clip decodes")
    docs.foreach { id =>
      val nf = 4 + (id % 4).toInt
      val sl = 2 + (id % 2).toInt
      val scenes = (nf + sl - 1) / sl
      val (gotF, gotS, gotL) = rows(id)
      assert(gotF === nf.toLong, s"doc $id frame count")
      assert(gotS === scenes.toLong,
        s"doc $id: planted ceil($nf/$sl)=$scenes scenes")
      assert(gotL === sl.toLong.min(nf.toLong), s"doc $id longest shot")
    }
  }

  test("q189 catches every planted trimmed probe (recall = 1)") {
    val spark = SparkSpec.session
    val pairs = SparkEntry.queries("q189_clip_containment")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probes = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(probes.nonEmpty)
    probes.foreach { id =>
      assert(pairs.contains((id + 1000000L, id)),
        s"trimmed probe of doc $id not found contained in its base")
    }
    // and never the reverse: a base (more scenes) is not contained in
    // its own trim
    probes.foreach { id =>
      assert(!pairs.contains((id, id + 1000000L)),
        s"base doc $id wrongly contained in its trimmed probe")
    }
  }
}
