package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** The native perceptual-hash block reducer (block_means64) against
  * an independent reference using the ORACLE's spelling of the block
  * partition (1-based ((p-1)·64) // n, vs the expression's 0-based
  * (i·64) div n) — the q172/q173 engine-equality claim in miniature.
  * Covers payloads shorter than 64 bytes (empty blocks must read 0),
  * exact multiples, off-by-one lengths, and null propagation.
  */
class BlockMeansSpec extends SparkSpec {

  private def reference(bytes: Array[Byte]): Seq[Int] = {
    val n = bytes.length
    val sums = Array.fill(64)(0L)
    val cnts = Array.fill(64)(0L)
    for (p <- 1 to n) { // oracle spelling: block of 1-based p
      val blk = (((p - 1).toLong * 64L) / n).toInt
      sums(blk) += (bytes(p - 1) & 0xff)
      cnts(blk) += 1
    }
    (0 until 64).map(k =>
      if (cnts(k) == 0) 0 else (sums(k) / cnts(k)).toInt)
  }

  test("native block means equal the oracle-spelled reference") {
    import spark.implicits._
    graft.functions.BlockMeans.register(spark)
    val rnd = new Random(10641)
    val lengths = Seq(1, 3, 63, 64, 65, 128, 200, 1000, 2048)
    val payloads = lengths.map { n =>
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val got = payloads.toDF("text")
      .select(expr("block_means64(text)").as("bm"))
      .collect().map(_.getSeq[Int](0).toSeq)
    payloads.zip(got).foreach { case (p, g) =>
      assert(g === reference(p.getBytes("UTF-8")),
        s"mismatch for length ${p.length}")
    }
  }

  test("null in, null out") {
    import spark.implicits._
    graft.functions.BlockMeans.register(spark)
    val r = Seq[Option[String]](None, Some("abcd")).toDF("text")
      .select(expr("block_means64(text)").as("bm")).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }
}
