package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real DEFLATE decoder at the multimodal seam (q194): genuine
  * zlib round trips and the lenient-ingest contract on malformed
  * streams.
  */
class GzipDecodeSpec extends AnyFunSuite {

  private def gz(s: String): Array[Byte] =
    Multimodal.gzipBytes(s.getBytes("UTF-8"))

  test("round trip recovers the exact bytes") {
    val texts = Seq("", "a", "hello world " * 1000,
      "snowman ☃ and friends 😀")
    texts.foreach { t =>
      val got = Multimodal.gunzip(gz(t))
      assert(got.isDefined)
      assert(new String(got.get, "UTF-8") === t)
    }
  }

  test("multi-member streams read through (the gzip spec's concat rule)") {
    val both = gz("first half ") ++ gz("second half")
    val got = Multimodal.gunzip(both)
    assert(got.isDefined)
    assert(new String(got.get, "UTF-8") === "first half second half")
  }

  test("malformed streams are None, never a crash or partial output") {
    assert(Multimodal.gunzip(Array.emptyByteArray).isEmpty)
    assert(Multimodal.gunzip("not gzip at all".getBytes).isEmpty,
      "wrong magic")
    val whole = gz("some payload that compresses")
    assert(Multimodal.gunzip(whole.dropRight(6)).isEmpty,
      "truncated member (missing CRC/ISIZE trailer)")
    val corrupt = whole.clone()
    corrupt(whole.length / 2) = (corrupt(whole.length / 2) ^ 0x55).toByte
    assert(Multimodal.gunzip(corrupt).isEmpty,
      "flipped bits mid-stream fail the CRC, not silently decode")
  }
}
