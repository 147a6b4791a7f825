package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed-write demo: the 100 TB co-location story. Writing both
  * sides of a frequently-joined pair bucketed (and sorted) by the join
  * key lets every subsequent equi-join on that key run with NO shuffle
  * exchange — the bucket files ARE the partitioning, persisted on
  * disk, paid once at write time and amortized over every downstream
  * join/aggregation on user_id.
  */
class BucketingSpec extends SparkSpec {

  test("joins on the bucket key run without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '$wh'")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // repartition on the bucket key first: it hash-aligns with the
      // bucket spec (both Murmur3 pmod), so each task writes exactly
      // one file per bucket — Spark only trusts bucket-file sort
      // order (and skips the join-side sort) when a bucket is a
      // single file.
      val ev = Tables(spark, sf001, "events")
      ev.repartition(8, col("user_id"))
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .format("parquet").mode("overwrite").saveAsTable("bdemo.events_b")
      ev.filter(col("event_type") === "heart_rate")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_hr"))
        .repartition(8, col("user_id"))
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .format("parquet").mode("overwrite").saveAsTable("bdemo.user_hr_b")

      // Force the join shape that would otherwise shuffle both sides.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Since 3.0 Spark ignores bucket sort metadata unless this flag
      // is set (multi-file buckets made it unsafe); our buckets are
      // single-file by construction, where it is sound.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

      val joined = spark.table("bdemo.events_b")
        .join(spark.table("bdemo.user_hr_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      // Bucket files are written pre-sorted by the join key, so the
      // merge join needs no per-task sort either.
      assert(!plan.contains("Sort ["),
        s"bucket-sorted join must not re-sort, got plan:\n$plan")

      // The same bucketing also feeds shuffle-free aggregation.
      val agg = spark.table("bdemo.events_b")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"aggregation on the bucket key must not shuffle:\n$aggPlan")

      // And the results are right: every heart-rate row pairs with its
      // per-user count.
      val hrRows = joined.filter(col("event_type") === "heart_rate").count()
      val expected = Tables(spark, sf001, "events")
        .filter(col("event_type") === "heart_rate").count()
      assert(hrRows === expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")
    }
  }
}
