package graft

import java.nio.file.Files
import scala.collection.mutable

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Pipeline observability: `observe()` metrics ride inside the job
  * (computed by the same tasks that do the work — no second scan, no
  * extra action) and surface through the Observation handle in batch
  * and through StreamingQueryListener progress events in streaming.
  * This is how a 100 TB run reports rows-dropped / rows-kept without
  * paying for a monitoring pass.
  */
class ObservabilitySpec extends SparkSpec {

  test("batch observe(): filter selectivity metered in-flight") {
    val obs = Observation("sample_metrics")
    val sampled = SparkEntry.queries("q46_sample_strat")(spark, sf001)
    val docs = Tables(spark, sf001, "documents")
      .withColumn("kept", col("doc_id").isin(
        sampled.select("doc_id").collect().map(_.getLong(0)).toSeq: _*))
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("rows_kept"))
    val kept = docs.filter(col("kept")).count()
    val m = obs.get
    assert(m("rows_seen") == Tables(spark, sf001, "documents").count())
    assert(m("rows_kept") == kept)
  }

  test("streaming observe(): per-batch metrics reach the listener") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._

    val seen = mutable.ArrayBuffer.empty[Row]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryIdle(e: QueryIdleEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("ingest_metrics")) seen.synchronized {
          seen += m.get("ingest_metrics")
        }
      }
    }
    spark.streams.addListener(listener)
    try {
      val src = MemoryStream[String]
      val parsed = graft.sources.JsonIngest.heartRate(src.toDF())
        .observe("ingest_metrics",
          count(lit(1)).as("events"),
          sum(when(col("heart_rate") > 100, 1L).otherwise(0L)).as("high_hr"))
      val q = parsed.writeStream
        .format("memory").queryName("obs_stream").outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt_obs").toString)
        .start()
      def hr(u: Long, h: Int): String =
        s"""{"user_id": $u, "heart_rate": $h, "ts": "2024-01-01T00:00:00Z"}"""
      src.addData(hr(1, 120), hr(2, 80), hr(3, 130))
      q.processAllAvailable()
      src.addData(hr(4, 90))
      q.processAllAvailable()
      q.stop()

      val batches = seen.synchronized(seen.toList)
      assert(batches.nonEmpty, "expected observed metrics in progress events")
      val totalEvents = batches.map(_.getAs[Long]("events")).sum
      val totalHigh = batches.map(_.getAs[Long]("high_hr")).sum
      assert(totalEvents == 4)
      assert(totalHigh == 2)
    } finally spark.streams.removeListener(listener)
  }
}
