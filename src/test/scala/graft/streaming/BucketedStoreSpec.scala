package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import IncrementalPipelines.{DedupIngest, LatestWinsStore}

/** The 100 TB claim of IncrementalPipelines made executable: when the
  * persisted store is a table bucketed on the join/merge key, the
  * corpus-sized store side of both incremental paths arrives
  * co-partitioned from disk — NO shuffle exchange on the store side;
  * only the (batch-sized) stream side moves. BucketingSpec proves the
  * mechanism generically; this spec composes it with the actual
  * operators (DedupIngest.kept inside a running streaming query,
  * LatestWinsStore.mergeFrames), which is what COVERAGE.md's posture
  * statements promise.
  */
class BucketedStoreSpec extends SparkSpec {

  private def storeSideExchanges(j: SortMergeJoinExec): Int =
    j.right.collect { case e: ShuffleExchangeExec => e }.size

  test("DedupIngest anti-joins a bucketed fp store with no store-side exchange") {
    val wh = Files.createTempDirectory("graft_wh_fp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS fpstore LOCATION '$wh'")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // store: fingerprints of already-ingested docs, bucketed on fp
      // with bucket count == spark.sql.shuffle.partitions so the
      // stream side's stateful-dedup partitioning lines up exactly
      val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
      spark.range(2).select(md5(concat(lit("doc"), col("id"))).as("fp"))
        .repartition(buckets, col("fp"))
        .write.bucketBy(buckets, "fp").sortBy("fp")
        .format("parquet").mode("overwrite").saveAsTable("fpstore.fps_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      implicit val ctx = spark.sqlContext
      import spark.implicits._
      val docs = MemoryStream[(Long, String, Long)]
      val q = DedupIngest.start(
        docs.toDF().toDF("doc_id", "text", "ms")
          .select(col("doc_id"), col("text"),
            (col("ms") / 1000).cast("timestamp").as("ts")),
        spark.table("fpstore.fps_b"), "10 seconds", "bkt_kept",
        Files.createTempDirectory("ckpt_bkt").toString)
      docs.addData((1L, "doc0", 1000000L), (2L, "novel", 1001000L))
      q.processAllAvailable()
      val plan = q.asInstanceOf[StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      q.stop()

      val antis = plan.collect {
        case j: SortMergeJoinExec if j.joinType.sql.contains("ANTI") => j
      }
      assert(antis.size == 1, s"expected the left-anti store join:\n$plan")
      assert(storeSideExchanges(antis.head) == 0,
        s"bucketed store side must not shuffle:\n$plan")
      // and the join is semantically right: doc0's fp is in the store
      val kept = spark.table("bkt_kept").collect().map(_.getLong(0)).toSeq
      assert(kept === Seq(2L), s"store dup must drop, got $kept")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP DATABASE IF EXISTS fpstore CASCADE")
    }
  }

  test("LatestWinsStore.mergeFrames joins a bucketed store with no store-side exchange") {
    val wh = Files.createTempDirectory("graft_wh_lw").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS lwstore LOCATION '$wh'")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
      import spark.implicits._
      Seq((1L, 100L, 10L, "view", 1L), (2L, 50L, 12L, "view", 2L))
        .toDF("user_id", "us", "event_id", "event_type", "cv")
        .repartition(buckets, col("user_id"))
        .write.bucketBy(buckets, "user_id").sortBy("user_id")
        .format("parquet").mode("overwrite").saveAsTable("lwstore.state_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val batch = Seq((1L, 200L, 11L, "click", 3L), (3L, 10L, 15L, "view", 4L))
        .toDF("user_id", "us", "event_id", "event_type", "cv")
      val merged = LatestWinsStore.mergeFrames(spark.table("lwstore.state_b"), batch)
      val plan = merged.queryExecution.executedPlan
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.size == 1, s"expected the full-outer merge join:\n$plan")
      assert(joins.head.joinType.sql == "FULL OUTER", joins.head.joinType.sql)
      // store is the LEFT side of mergeFrames' join
      val storeExchanges = joins.head.left.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(storeExchanges.isEmpty,
        s"bucketed store side must not shuffle:\n$plan")
      val got = merged.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === Map(1L -> (200L, 11L), 2L -> (50L, 12L), 3L -> (10L, 15L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP DATABASE IF EXISTS lwstore CASCADE")
    }
  }
}
