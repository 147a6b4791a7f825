package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Property test for [[graft.operators.Similarity.saltedPairs]]: on
  * seeded random group assignments the salted block generation must
  * produce EXACTLY the naive within-group combination set — every
  * unordered pair once, none across groups, none duplicated by the
  * salt — for several K (including K larger than some group sizes,
  * which exercises empty chunks and single-member blocks).
  */
class SaltedPairsSpec extends SparkSpec {

  private def check(seed: Long, nIds: Int, nKeys: Int, k: Int): Unit = {
    val rnd = new Random(seed)
    val rows = (0 until nIds).map(i => (rnd.nextInt(nKeys).toLong, i.toLong))
    import spark.implicits._
    val members = rows.toDF("key", "id")
      .select(col("key"), struct(col("id").as("id")).as("m"))

    val got = operators.Similarity.saltedPairs(members, Seq("key"), k)
      .select(col("key"), col("pa.id").as("a"), col("pb.id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val expected = rows.groupBy(_._1).flatMap { case (key, ms) =>
      val ids = ms.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (key, ids(i), ids(j))
    }.toSet

    assert(got == expected,
      s"seed=$seed k=$k: missing=${(expected -- got).take(5)} " +
        s"extra=${(got -- expected).take(5)}")
    // pa.id < pb.id invariant
    assert(got.forall { case (_, a, b) => a < b })
  }

  test("salted block pairs == naive combinations across seeds and K") {
    check(seed = 1, nIds = 200, nKeys = 7, k = 4)
    check(seed = 2, nIds = 100, nKeys = 3, k = 8)
    check(seed = 3, nIds = 50, nKeys = 25, k = 4) // many tiny groups
    check(seed = 4, nIds = 30, nKeys = 1, k = 1) // K=1 degenerates to plain
  }
}
