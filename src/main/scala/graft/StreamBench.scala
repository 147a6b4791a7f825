package graft

import java.nio.file.Files

import graft.streaming.AlertPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming throughput benchmark: drives N synthetic biometric events
  * (half heart-rate, half blood-pressure; ~1% qualifying pairs)
  * through the FULL alert pipeline — parse → union → watermark →
  * sliding window (60s/5s) flag agg → cooldown — and reports
  * events/second. This is the apples-to-apples number against the
  * reference's single-node stream processors (which are hand-fed 5–8
  * events; any measured rate beats it, so the figure documents
  * headroom, not a contest).
  *
  * Usage: runMain graft.StreamBench [nEvents] [batchSize]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val batch = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_ROCKSDB"))
      graft.streaming.AlertSinks.useRocksDBStateStore(spark)
    implicit val ctx = spark.sqlContext
    import spark.implicits._

    val hr = MemoryStream[String]
    val bp = MemoryStream[String]
    val cfg = AlertPipeline.Config(
      windowLength = "60 seconds", windowSlide = "5 seconds",
      cooldownMs = 300000L)
    val alerts = AlertPipeline(hr.toDF(), bp.toDF(), cfg)
    // Checkpoint on tmpfs: this VM's block device has multi-ms fsync
    // latency, and state-store commits fsync per partition per operator
    // per batch — on slow disks that dominates the measurement (state
    // commit times 10x the compute). A real cluster checkpoints to
    // HDFS/object storage with proper write paths.
    val ckptBase =
      if (new java.io.File("/dev/shm").isDirectory) new java.io.File("/dev/shm")
      else Files.createTempDirectory("ckpt_base").toFile
    val q = alerts.writeStream.format("memory").queryName("sb")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(ckptBase.toPath, "ckpt_sb").toString)
      .start()

    val t0Ms = 1700000000000L
    val users = 10000
    def hrJson(i: Long): String = {
      val rate = if (i % 97 == 0) 150 else 70 // ~1% high
      s"""{"user_id":${i % users},"heart_rate":$rate,"timestamp":${t0Ms + i}}"""
    }
    def bpJson(i: Long): String = {
      val sys = if (i % 101 == 0) 85 else 120 // ~1% low
      s"""{"user_id":${i % users},"systolic":$sys,"diastolic":80,"timestamp":${t0Ms + i}}"""
    }

    // warmup
    hr.addData((0L until 1000L).map(hrJson))
    bp.addData((0L until 1000L).map(bpJson))
    q.processAllAvailable()

    val t0 = System.nanoTime()
    var i = 1000L
    while (i < n / 2) {
      val end = math.min(i + batch, n / 2)
      // one MemoryStream block per addData call = one input partition:
      // feed 16 blocks per side so parse/expand/partial-agg parallelize
      // (a single big block starves everything before the first shuffle)
      val step = math.max(1L, (end - i) / 16)
      var j = i
      while (j < end) {
        val e2 = math.min(j + step, end)
        hr.addData((j until e2).map(hrJson))
        bp.addData((j until e2).map(bpJson))
        j = e2
      }
      q.processAllAvailable()
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG")) {
        q.recentProgress.foreach { p =>
          println(s"BATCH ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
          p.stateOperators.foreach(so => println(
            s"  STATE op=${so.operatorName} rowsUpdated=${so.numRowsUpdated} " +
              s"rowsRemoved=${so.numRowsRemoved} total=${so.numRowsTotal} " +
              s"commitMs=${so.allUpdatesTimeMs}/${so.allRemovalsTimeMs}/${so.commitTimeMs} " +
              s"mem=${so.memoryUsedBytes}"))
        }
      }
      i = end
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val processed = (n / 2 - 1000) * 2
    val nAlerts = spark.table("sb").count()
    val json =
      s"""{"metric":"stream_throughput","value":${processed / secs},"unit":"events/sec","events":$processed,"secs":$secs,"alerts":$nAlerts}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "STREAMBENCH_OUT.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    q.stop()
    spark.stop()
  }
}
