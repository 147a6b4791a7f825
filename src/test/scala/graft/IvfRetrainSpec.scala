package graft

import java.nio.file.Files

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** [[Similarity.retrainIvfStore]] end to end: build the pair, land an
  * "ingest batch" (clones assigned through the OLD centroids, exactly
  * what AnnIngest writes), retrain, and pin (1) the roll-forward
  * contract, (2) bit-exact warm-start centroids (the new centroid
  * table equals one lloydStep over the union — the arithmetic q161's
  * oracle hash also covers), (3) churn conservation (every vector
  * appears in exactly one (old,new) transition), and (4) serving:
  * search over the retrained pair still returns a planted clone's
  * source as top-1.
  */
class IvfRetrainSpec extends SparkSpec {

  test("retrainIvfStore rolls the pair forward with exact warm-start centroids, conserved churn, and working search") {
    val wh = Files.createTempDirectory("graft_wh_retrain").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS rt LOCATION '$wh'")
    try {
      Similarity.writeIvfStore(spark, sf001, "rt.cents0", "rt.cells0")
      val base = spark.table("rt.cells0")

      // the "landed batch": clones of vectors 0..4, assigned through
      // the CURRENT centroids (AnnIngest's per-batch computation)
      val clonesV = Tables(spark, sf001, "embeddings")
        .filter(col("vec_id") < 5)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      val batch = Similarity.assignCells(clonesV, spark.table("rt.cents0"))
        .join(clonesV, "vec_id")
        .select(col("vec_id"), col("cell"), col("v"))

      val churn = Similarity.retrainIvfStore(spark, "rt.cents0", "rt.cells0",
        batch, "rt.cents1", "rt.cells1").collect()

      // roll-forward refused in place
      intercept[IllegalArgumentException] {
        Similarity.retrainIvfStore(spark, "rt.cents0", "rt.cells0",
          batch, "rt.cents1", "rt.cells0")
      }

      // (2) the written centroids ARE one warm-start lloydStep over
      // the union — bit-exact, element by element
      val union = base.select(col("vec_id"), col("v"))
        .union(batch.select(col("vec_id"), col("v")))
      val want = Similarity.lloydStep(union, spark.table("rt.cents0"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val got = spark.table("rt.cents1")
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(got.keySet == want.keySet, s"cells ${got.keySet} vs ${want.keySet}")
      got.foreach { case (c, vs) =>
        assert(vs == want(c), s"centroid $c drifted from the warm-start step")
      }

      // (3) churn conserves the corpus; cells stay in range
      val n = base.count() + 5
      assert(churn.map(_.getLong(2)).sum === n,
        "every vector in exactly one transition")
      churn.foreach { r =>
        assert(r.getLong(0) >= 0 && r.getLong(0) <= 15, r.toString)
        assert(r.getLong(1) >= 0 && r.getLong(1) <= 15, r.toString)
        assert(r.getLong(2) > 0, r.toString)
      }

      // (4) serving over the retrained pair: each clone's nearest
      // neighbor is its source vector at sim ≈ 1
      val queries = clonesV.select(col("vec_id").as("q_id"), col("v"))
      val hits = Similarity.annSearch(queries, spark.table("rt.cents1"),
        spark.table("rt.cells1").select(col("vec_id"), col("cell"), col("v")),
        nprobe = 2, k = 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      (0L to 4L).foreach { i =>
        val (nn, sim) = hits(i + 2000000L)
        assert(nn === i, s"clone of $i served $nn")
        assert(sim > 0.9999, s"clone sim $sim")
      }
    } finally {
      Seq("rt.cents0", "rt.cells0", "rt.cents1", "rt.cells1")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql("DROP DATABASE IF EXISTS rt")
    }
  }
}
