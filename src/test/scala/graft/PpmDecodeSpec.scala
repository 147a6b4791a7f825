package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real raster parser at the multimodal decoder seam (q179):
  * netpbm P6 per spec — whitespace-separated header tokens,
  * `#` comments legal anywhere in the header, exactly one whitespace
  * byte before the raw plane, full-byte-range pixel data — and the
  * lenient-ingest contract on everything malformed.
  */
class PpmDecodeSpec extends AnyFunSuite {

  private def ppm(header: String, px: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ px

  private val px6 = Array.tabulate[Byte](2 * 1 * 3)(i => (i * 40 + 7).toByte)

  test("canonical header parses; plane bytes come back exactly") {
    val Some((w, h, plane)) = Multimodal.decodePpm(ppm("P6\n2 1\n255\n", px6))
    assert((w, h) === ((2, 1)))
    assert(plane.toSeq === px6.toSeq)
  }

  test("comments and exotic whitespace in the header are legal netpbm") {
    val hdr = "P6 # a comment\n\t2\r\n# another\n 1 \n255\n"
    val Some((w, h, plane)) = Multimodal.decodePpm(ppm(hdr, px6))
    assert((w, h) === ((2, 1)))
    assert(plane.toSeq === px6.toSeq)
  }

  test("multi-digit dimensions shift the plane start correctly") {
    val px = Array.tabulate[Byte](16 * 12 * 3)(i => (i % 251).toByte)
    val Some((w, h, plane)) = Multimodal.decodePpm(ppm("P6\n16 12\n255\n", px))
    assert((w, h) === ((16, 12)))
    assert(plane.length === 16 * 12 * 3)
    assert(plane.toSeq === px.toSeq)
  }

  test("full-byte-range plane (0x00 and 0xFF) survives the parse") {
    val px = Array[Byte](0, -1, 127, -128, 1, -2) // 2×1×3
    val Some((_, _, plane)) = Multimodal.decodePpm(ppm("P6\n2 1\n255\n", px))
    assert(plane.toSeq === px.toSeq)
  }

  test("malformed payloads are None, never a crash or a garbage plane") {
    assert(Multimodal.decodePpm(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePpm("P5\n2 1\n255\n".getBytes).isEmpty,
      "wrong magic (P5 is grayscale)")
    assert(Multimodal.decodePpm(ppm("P6\n2 1\n65535\n",
      Array.fill[Byte](12)(0))).isEmpty, "16-bit maxval unsupported")
    assert(Multimodal.decodePpm(ppm("P6\n2 1\n255\n",
      px6.take(4))).isEmpty, "truncated plane")
    assert(Multimodal.decodePpm(ppm("P6\n0 1\n255\n",
      Array.emptyByteArray)).isEmpty, "zero width")
    assert(Multimodal.decodePpm("P6\n2 x\n255\n".getBytes).isEmpty,
      "non-numeric height")
  }

  test("adversarial dimensions overflow to None, not a crash (round-12 fix)") {
    // 46341² · 3 wraps Int negative — pre-fix this passed the
    // truncation check and crashed copyOfRange
    assert(Multimodal.decodePpm("P6\n46341 46341\n255\n ".getBytes).isEmpty,
      "w·h·3 Int overflow must read as truncated, not negative-size")
    // a 12-digit dimension overflows the Int accumulator itself
    assert(Multimodal.decodePpm("P6\n999999999999 2\n255\n ".getBytes).isEmpty,
      "overlong dimension digits must not wrap into a small positive")
    // near-max legal-looking dims with a tiny payload: still None
    assert(Multimodal.decodePpm("P6\n2147483647 2147483647\n255\n ".getBytes)
      .isEmpty)
  }

  test("trailing bytes after the plane are tolerated (stream padding)") {
    val Some((_, _, plane)) =
      Multimodal.decodePpm(ppm("P6\n2 1\n255\n", px6 :+ 99.toByte))
    assert(plane.toSeq === px6.toSeq)
  }
}
