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
}
