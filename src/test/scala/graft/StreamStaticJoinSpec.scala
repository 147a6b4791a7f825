package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment: the standard dimension-lookup shape — a
  * streaming fact joined per micro-batch against a static (slowly
  * refreshed) dimension table. The static side broadcasts, so the
  * stream never shuffles for the join and no join state accumulates
  * (unlike stream-stream joins, a static lookup is stateless).
  */
class StreamStaticJoinSpec extends SparkSpec {

  test("streaming alerts enrich against a static user dimension") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._

    val dim = Seq(
      (12345L, "ward-a"), (12346L, "ward-b"), (12347L, "ward-c"))
      .toDF("user_id", "ward")

    val src = MemoryStream[String]
    val enriched = graft.sources.JsonIngest.heartRate(src.toDF())
      .filter(col("heart_rate") > 100)
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("user_id"), col("heart_rate"),
        coalesce(col("ward"), lit("unknown")).as("ward"))

    val q = enriched.writeStream
      .format("memory").queryName("enrich").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_enrich").toString)
      .start()
    def hr(u: Long, h: Int): String =
      s"""{"user_id": $u, "heart_rate": $h, "ts": "2024-01-01T00:00:00Z"}"""
    src.addData(hr(12345, 120), hr(12346, 90), hr(99999, 150))
    q.processAllAvailable()
    src.addData(hr(12346, 140))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("enrich")
      .collect()
      .map(r => (r.getAs[Number]("user_id").longValue, r.getString(2))).toSet
    // 12346@90 filtered out; unknown user keeps flowing with a default
    assert(rows == Set((12345L, "ward-a"), (99999L, "unknown"),
      (12346L, "ward-b")))

    // the dimension side must broadcast — same operator tree on a
    // static fact shows the join shape the micro-batches execute
    val batchTwin = Seq((12345L, 120)).toDF("user_id", "heart_rate")
      .join(broadcast(dim), Seq("user_id"), "left")
    val plan = batchTwin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dimension lookup must not SMJ:\n$plan")
  }
}
