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

  // ---- round-12: member framing (gunzipMembers, the WARC/WET shape) ----

  private def members(p: Array[Byte]): Option[Seq[String]] =
    Multimodal.gunzipMembers(p).map(_.map(new String(_, "UTF-8")))

  test("member framing recovers each record at its boundary") {
    val docs = Seq("first record", "", "third " * 500, "snowman ☃")
    val got = members(docs.map(gz).reduce(_ ++ _))
    assert(got === Some(docs),
      "every member must come back whole, in order, boundaries exact")
    // single member degenerates to the q194 case
    assert(members(gz("solo")) === Some(Seq("solo")))
  }

  test("framing agrees with the spec's concat rule (read-through gunzip)") {
    val docs = Seq("alpha ", "beta ", "gamma")
    val payload = docs.map(gz).reduce(_ ++ _)
    val joined = Multimodal.gunzip(payload).map(new String(_, "UTF-8"))
    assert(members(payload).map(_.mkString) === joined,
      "concatenated members must equal the read-through decode")
  }

  test("optional header fields real crawlers write are walked correctly") {
    // the JDK writes bare headers; splice FNAME / FEXTRA / FHCRC-free
    // variants by hand around a raw deflate body + trailer
    val base = gz("payload with a name")
    val deflateAndTrailer = base.drop(10) // header is 10 bytes, no options
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fname = Array(0x1f, 0x8b, 8, 8, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
      "crawl-record.txt".getBytes("US-ASCII") :+ 0.toByte
    val fextra = Array(0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
      le16(6) ++ "XXextr".getBytes("US-ASCII")
    assert(members(fname ++ deflateAndTrailer) ===
      Some(Seq("payload with a name")), "FNAME field skipped")
    assert(members(fextra ++ deflateAndTrailer) ===
      Some(Seq("payload with a name")), "FEXTRA field skipped")
    assert(members(gz("plain ") ++ fname ++ deflateAndTrailer) ===
      Some(Seq("plain ", "payload with a name")),
      "optioned member mid-chain keeps later boundaries aligned")
    // unterminated FNAME: runs off the payload — None, not a hang
    val unterminated = fname.takeWhile(_ != 0)
    assert(members(unterminated).isEmpty)
  }

  test("member framing is all-or-none on malformed chains") {
    assert(members(Array.emptyByteArray).isEmpty, "empty payload")
    val two = gz("good one ") ++ gz("good two")
    assert(members(two.dropRight(5)).isEmpty,
      "truncated final member rejects the whole file")
    val midCorrupt = two.clone()
    midCorrupt(6) = 0x7f.toByte // mutate first member's MTIME — header
    assert(members(midCorrupt).isDefined,
      "MTIME is not load-bearing; sanity check the mutation site")
    val bodyCorrupt = two.clone()
    bodyCorrupt(14) = (bodyCorrupt(14) ^ 0x55).toByte
    assert(members(bodyCorrupt).isEmpty,
      "corrupt first member rejects the chain (no silent tail salvage)")
    assert(members(two ++ "trailing garbage".getBytes).isEmpty,
      "non-gzip trailing bytes reject the chain")
    val badCrc = two.clone()
    badCrc(two.length - 6) = (badCrc(two.length - 6) ^ 1).toByte
    assert(members(badCrc).isEmpty, "trailer CRC mismatch rejects")
  }
}
