package graft

import java.nio.file.Files

import graft.model.Alert
import graft.streaming.AlertPipeline
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

/** Wall-clock smoke for the PROCESSING-time cooldown arm — the
  * reference's native T1/T2 semantics (suppress, then re-alert once
  * real time passes the cooldown — BiometricAlertStreamProcessor
  * .scala:67–77). The deterministic specs pin the event-time arm;
  * this one lets actual time pass and relies on Spark's no-data
  * micro-batches to fire the ProcessingTimeTimeout. It polls the sink
  * instead of `processAllAvailable` (which spins when wall-clock
  * timeouts are pending — the AlertPipeline scaladoc's warning).
  */
class ProcessingTimeCooldownSpec extends SparkSpec {

  private val T0 = 1700000000000L

  test("processing-time cooldown re-alerts after real wall-clock expiry") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Int, String, Long)]
    val alerts = in.toDF().toDF("user_id", "message", "ms")
      .select(col("user_id"), col("message"),
        (col("ms") / 1000).cast("timestamp").as("ts"))
    val cfg = AlertPipeline.Config(cooldownMs = 2000L,
      timeout = GroupStateTimeout.ProcessingTimeTimeout)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = AlertPipeline.dedupe(alerts, cfg).writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_pt").toString)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch { (b: Dataset[Alert], _: Long) =>
        b.collect().foreach(a => out.add(a.user_id))
      }
      .start()
    def waitFor(n: Int, ms: Long): Boolean = {
      val deadline = System.currentTimeMillis() + ms
      while (out.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      out.size >= n
    }
    try {
      in.addData((1, "hr+bp anomaly", T0))
      assert(waitFor(1, 15000), "first alert must emit")
      // same event time again: the state is alive, so this must be
      // suppressed (and must NOT extend the cooldown)
      in.addData((1, "hr+bp anomaly", T0))
      Thread.sleep(1200)
      assert(out.size == 1,
        s"re-alert before wall-clock expiry must be suppressed: $out")
      // let REAL time pass the 2 s cooldown; no-data micro-batches
      // fire the timeout and drop the state
      Thread.sleep(2600)
      in.addData((1, "hr+bp anomaly", T0))
      assert(waitFor(2, 15000),
        s"alert after wall-clock expiry must emit again: $out")
    } finally q.stop()
  }
}
