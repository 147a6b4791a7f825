package graft

import java.nio.file.Files

import graft.streaming.{AlertPipeline, AlertSinks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Golden scenario 1 through the `transformWithState` cooldown —
  * must behave identically to the flatMapGroupsWithState version.
  */
class TransformWithStateSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def hrJson(user: Int, hr: Int, ts: Long) =
    s"""{"user_id":$user,"heart_rate":$hr,"timestamp":$ts}"""
  private def bpJson(user: Int, sys: Int, ts: Long) =
    s"""{"user_id":$user,"systolic":$sys,"diastolic":80,"timestamp":$ts}"""

  test("transformWithState cooldown matches golden scenario 1") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    AlertSinks.useRocksDBStateStore(spark)
    try {
      val hr = MemoryStream[String]
      val bp = MemoryStream[String]
      val cfg = AlertPipeline.Config()
      val alerts = AlertPipeline.dedupeTws(
        AlertPipeline.rawAlerts(AlertPipeline.ingest(hr.toDF(), bp.toDF()), cfg),
        cfg, stateTtl = false)
      val q = alerts.writeStream.format("memory").queryName("tws1")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt_tws1").toString)
        .start()

      bp.addData(bpJson(12345, 120, T0), bpJson(12346, 80, T0))
      q.processAllAvailable()
      hr.addData(hrJson(12345, 200, T0 + 2000), hrJson(12345, 200, T0 + 2000),
        hrJson(12346, 101, T0 + 2000))
      q.processAllAvailable()
      hr.addData(hrJson(99999, 50, T0 + 60000))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws1").collect()
      assert(rows.map(_.getInt(0)).toSeq === Seq(12346))
      assert(rows.head.getTimestamp(2).getTime === T0 + 2999)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState re-emits exactly once after cooldown expiry (parity with fMGWS)") {
    // the continuous-alerting scenario AlertStreamSpec pins for the
    // flatMapGroupsWithState path, run through the SAME full pipeline
    // (ingest → window flags → alert map) with dedupeTws swapped in:
    // the two cooldown operators must enforce the identical debounce
    // invariant, making transformWithState a drop-in production path
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    AlertSinks.useRocksDBStateStore(spark)
    try {
      val hr = MemoryStream[String]
      val bp = MemoryStream[String]
      val cfg = AlertPipeline.Config()
      val alerts = AlertPipeline.dedupeTws(
        AlertPipeline.rawAlerts(AlertPipeline.ingest(hr.toDF(), bp.toDF()), cfg),
        cfg, stateTtl = false)
      val q = alerts.writeStream.format("memory").queryName("tws2")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt_tws2").toString)
        .start()

      // user 42 alerts continuously for 12s; cooldown is 5s → panes
      // re-trigger at ~+5s and ~+10s after the first emission
      for (k <- 0 to 12) {
        bp.addData(bpJson(42, 80, T0 + k * 1000))
        hr.addData(hrJson(42, 150, T0 + k * 1000))
      }
      q.processAllAvailable()
      hr.addData(hrJson(99999, 50, T0 + 120000))
      q.processAllAvailable()
      q.stop()

      val times = spark.table("tws2").collect().filter(_.getInt(0) === 42)
        .map(_.getTimestamp(2).getTime).sorted.toSeq
      assert(times.nonEmpty && times.length >= 2)
      times.zip(times.drop(1)).foreach { case (a, b) => assert(b - a >= 5000) }
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
