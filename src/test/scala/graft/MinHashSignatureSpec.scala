package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.functions._

/** Unit tests for the one-buffer minhash sketch aggregate. */
class MinHashSignatureSpec extends SparkSpec {

  private def sigOf(ids: Seq[(Long, Long)], partitions: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    MinHashSignature.register(spark)
    ids.toDF("doc_id", "sid")
      .repartition(partitions)
      .groupBy(col("doc_id"))
      .agg(expr("minhash_sig(sid)").as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
  }

  test("merge across partitions equals single-partition result") {
    val rows = (0L until 200L).map(i => (i % 5, i * 7919L + 13L))
    val one = sigOf(rows, 1)
    val many = sigOf(rows, 8)
    assert(one === many)
    assert(one(0L).length === MinHashSignature.K)
  }

  test("signature is duplicate-insensitive and order-insensitive") {
    val base = Seq((1L, 11L), (1L, 22L), (1L, 33L))
    val dups = Seq((1L, 33L), (1L, 11L), (1L, 22L), (1L, 11L), (1L, 33L))
    assert(sigOf(base, 2) === sigOf(dups, 3))
  }

  test("hash family matches the documented formula") {
    val sig = sigOf(Seq((1L, 42L)), 1)(1L)
    val hb = 42L % MinHashSignature.P
    (0 until MinHashSignature.K).foreach { k =>
      val expect = (MinHashSignature.A(k) * hb + MinHashSignature.B(k)) %
        MinHashSignature.P
      assert(sig(k) === expect, s"k=$k")
    }
  }
}
