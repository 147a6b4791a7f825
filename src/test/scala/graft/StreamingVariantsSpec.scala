package graft

import java.nio.file.Files

import graft.operators.AlertOps
import graft.sources.JsonIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming tests for the two non-canonical pipeline formulations:
  * the Kafka-style interval band join (J2) and the Beam-style
  * session-window debounce (T4).
  */
class StreamingVariantsSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def hrJson(user: Int, hr: Int, ts: Long) =
    s"""{"user_id":$user,"heart_rate":$hr,"timestamp":$ts}"""
  private def bpJson(user: Int, sys: Int, ts: Long) =
    s"""{"user_id":$user,"systolic":$sys,"diastolic":80,"timestamp":$ts}"""

  test("streaming interval band join (J2) pairs events within the band") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val hr = MemoryStream[String]
    val bp = MemoryStream[String]
    val raw = AlertOps.bandJoinAlerts(
      JsonIngest.heartRate(hr.toDF()).withWatermark("ts", "0 seconds"),
      JsonIngest.bloodPressure(bp.toDF()).withWatermark("ts", "0 seconds"),
      "15 seconds")
    val q = raw.writeStream.format("memory").queryName("j2")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_j2").toString)
      .start()

    // Kafka fixture (golden scenario 3): BP sys=92 then two HR=200
    bp.addData(bpJson(12345, 92, T0))
    hr.addData(hrJson(12345, 200, T0 + 1000), hrJson(12345, 200, T0 + 3000))
    q.processAllAvailable()
    // HR outside the ±15s band must NOT pair
    hr.addData(hrJson(12345, 200, T0 + 60000))
    q.processAllAvailable()
    // advance both watermarks so joined rows finalize
    hr.addData(hrJson(99999, 50, T0 + 300000))
    bp.addData(bpJson(99999, 150, T0 + 300000))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("j2").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getInt(0) === 12345))
  }

  test("streaming full_outer band join emits unmatched (v, null) rows at watermark") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val hr = MemoryStream[String]
    val bp = MemoryStream[String]
    val raw = AlertOps.bandJoinPairs(
      JsonIngest.heartRate(hr.toDF()).withWatermark("ts", "0 seconds"),
      JsonIngest.bloodPressure(bp.toDF()).withWatermark("ts", "0 seconds"),
      "15 seconds")
    val q = raw.writeStream.format("memory").queryName("fo")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_fo").toString)
      .start()

    // user 1: HR + BP within the band  -> one matched row
    // user 2: qualifying HR, no BP     -> (hr_ts, null) after watermark
    // user 3: qualifying BP, no HR     -> (null, bp_ts) after watermark
    hr.addData(hrJson(1, 200, T0 + 1000), hrJson(2, 180, T0 + 2000))
    bp.addData(bpJson(1, 92, T0), bpJson(3, 90, T0 + 3000))
    q.processAllAvailable()
    // Unmatched rows finalize only once BOTH watermarks pass the join
    // window (Spark must prove no future match can arrive — the
    // emit-at-watermark difference vs Kafka Streams' eager emission).
    // Advancers must survive the qualifying filters (Catalyst pushes
    // them below the watermark node) and be outside every open band.
    hr.addData(hrJson(98, 150, T0 + 300000))
    bp.addData(bpJson(99, 80, T0 + 300000))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fo").collect()
      .filter(r => r.getInt(0) <= 3)
      .map(r => (r.getInt(0), r.isNullAt(1), r.isNullAt(2)))
      .sortBy(_._1)
    assert(rows.toSeq === Seq((1, false, false), (2, false, true), (3, true, false)))
  }

  test("streaming exact dedup via dropDuplicatesWithinWatermark") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val hr = MemoryStream[String]
    val deduped = JsonIngest.heartRate(hr.toDF())
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("user_id", "heart_rate"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_dd").toString)
      .start()
    // same (user, heart_rate) three times within the watermark window
    hr.addData(hrJson(5, 150, T0), hrJson(5, 150, T0 + 1000),
      hrJson(5, 150, T0 + 2000), hrJson(6, 120, T0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dd").collect()
    assert(rows.map(_.getAs[Int]("user_id")).sorted.toSeq === Seq(5, 6))
  }

  test("streaming session-window debounce (T4) emits one alert per burst") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val hr = MemoryStream[String]
    val alerts = JsonIngest.heartRate(hr.toDF())
      .withWatermark("ts", "0 seconds")
      .filter(AlertOps.highHeartRate)
      .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n"))
      .select(col("user_id"), col("first_ts"), col("n"))
    val q = alerts.writeStream.format("memory").queryName("t4")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_t4").toString)
      .start()

    // burst 1: three alerts within 10s; burst 2: one alert 60s later.
    // NOTE: the watermark-advancing events must themselves pass the
    // heart_rate filter — Catalyst pushes the row filter BELOW the
    // EventTimeWatermark node, so filtered-out events never advance
    // the watermark.
    hr.addData(hrJson(7, 150, T0), hrJson(7, 160, T0 + 3000),
      hrJson(7, 170, T0 + 6000))
    q.processAllAvailable()
    hr.addData(hrJson(7, 180, T0 + 60000))
    q.processAllAvailable()
    hr.addData(hrJson(99999, 150, T0 + 300000)) // advance watermark
    q.processAllAvailable()
    hr.addData(hrJson(99999, 150, T0 + 301000)) // flush at high watermark
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t4").collect()
      .filter(_.getInt(0) === 7).sortBy(_.getTimestamp(1).getTime)
    assert(rows.length === 2, s"got: ${rows.mkString("; ")}")
    assert(rows(0).getTimestamp(1).getTime === T0 && rows(0).getLong(2) === 3)
    assert(rows(1).getTimestamp(1).getTime === T0 + 60000 && rows(1).getLong(2) === 1)
  }

  test("streaming latest-wins compaction (q84 shape) as a foreachBatch store merge") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.IncrementalPipelines.LatestWinsStore
    import spark.implicits._
    val storeDir = Files.createTempDirectory("q84store").toString
    val changes = MemoryStream[(Long, Long, Long, String, Long)]
    val q = LatestWinsStore.start(
      changes.toDF().toDF("user_id", "us", "event_id", "event_type", "cv"),
      storeDir, Files.createTempDirectory("ckpt_q84").toString)

    // batch 1: user 1 twice (us 200 wins), user 2 once
    changes.addData((1L, 100L, 10L, "view", 100L), (1L, 200L, 11L, "click", 250L),
      (2L, 50L, 12L, "view", 90L))
    q.processAllAvailable()
    val after1 = LatestWinsStore.readStore(spark, storeDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after1 === Map(1L -> (200L, 11L), 2L -> (50L, 12L)))

    // batch 2: a LATE change for user 1 (us 150 — must NOT displace
    // 200), a newer one for user 2, and a brand-new user 3
    changes.addData((1L, 150L, 13L, "view", 70L), (2L, 300L, 14L, "purchase", 500L),
      (3L, 10L, 15L, "view", 30L))
    q.processAllAvailable()
    q.stop()
    val after2 = LatestWinsStore.readStore(spark, storeDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(after2 === Map(
      1L -> (200L, 11L, "click"),
      2L -> (300L, 14L, "purchase"),
      3L -> (10L, 15L, "view")),
      "late update must lose, new key must appear, old winner must persist")
  }

  test("curation capstone: ingest → normalize → dedup → shed → cooldown, restart-surviving") {
    // the streaming mirror of batch q100, all round-5/6 pieces in one
    // scenario: q107 normalization feeds the watermarked in-stream
    // dedup and the persisted-store anti-join; survivors shed to a
    // per-batch budget into a curated parquet landing zone; a second
    // checkpointed query streams the landing zone through the
    // per-source event-time cooldown. BOTH queries are stopped and
    // restarted mid-scenario — the dedup state (a restart replay of a
    // known fingerprint must still drop) and the cooldown state (a
    // source's window must keep suppressing) both come back from
    // their checkpoints.
    implicit val ctx = spark.sqlContext
    import graft.streaming.CurationPipeline
    import spark.implicits._
    val curatedDir = Files.createTempDirectory("cur_land").toString
    val alertDir = Files.createTempDirectory("cur_alerts").toString
    val ckptCur = Files.createTempDirectory("ckpt_cur").toString
    val ckptMon = Files.createTempDirectory("ckpt_mon").toString
    val store = spark.range(1).select(md5(lit("old news")).as("fp"))
    val docs = MemoryStream[(Long, Int, String, Long)]
    val shedTotal = new java.util.concurrent.atomic.AtomicLong
    def stream = docs.toDF().toDF("doc_id", "src_id", "text", "ms")
      .select(col("doc_id"), col("src_id"), col("text"),
        (col("ms") / 1000).cast("timestamp").as("ts"))
    def startCur() = CurationPipeline.startCuration(
      stream, store, "10 seconds", 2, curatedDir, ckptCur,
      shedTotal.addAndGet(_))
    def startMon() = CurationPipeline.startMonitor(
      spark, curatedDir, 60000L, "10 seconds", alertDir, ckptMon)

    // phase 1: d1 kept; d2 a normalized in-stream dup of d1; d3 a
    // store dup after normalization; d4 novel (same source as d1, so
    // its notification is cooldown-suppressed)
    var q1 = startCur(); var q2 = startMon()
    docs.addData((1L, 0, "Hello,   World!", T0),
      (2L, 0, "hello world", T0 + 1000),
      (3L, 1, "Old   News.", T0 + 2000),
      (4L, 0, "fresh content alpha", T0 + 3000))
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    def curated() = spark.read.schema(CurationPipeline.curatedSchema)
      .parquet(curatedDir).collect().map(_.getLong(0)).sorted.toSeq
    assert(curated() === Seq(1L, 4L), "phase 1 must keep exactly d1, d4")

    // phase 2, after restart: d5 replays d1's fingerprint — only the
    // RESTORED dedup state can drop it; d6 is a novel doc from a new
    // source
    q1 = startCur(); q2 = startMon()
    docs.addData((5L, 0, "HELLO world!!", T0 + 5000),
      (6L, 1, "brand new beta", T0 + 6000))
    q1.processAllAvailable(); q2.processAllAvailable()
    // burst batch over the budget of 2: the OLDEST (d7) is shed
    docs.addData((7L, 2, "gamma one", T0 + 80000),
      (8L, 2, "gamma two", T0 + 81000),
      (9L, 2, "gamma three", T0 + 82000))
    q1.processAllAvailable(); q2.processAllAvailable()
    // d10: same source as d1/d4, now past the 60 s cooldown window
    docs.addData((10L, 0, "delta final", T0 + 90000))
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    assert(curated() === Seq(1L, 4L, 6L, 8L, 9L, 10L),
      s"restored dedup must drop d5, shed must drop d7: ${curated()}")
    assert(shedTotal.get() === 1L, s"exactly d7 is shed, got $shedTotal")

    // golden notifications: one per source per cooldown window, the
    // suppressions spanning the restart
    val alerts = spark.read.parquet(alertDir).collect()
      .map(r => (r.getInt(r.fieldIndex("user_id")),
        r.getTimestamp(r.fieldIndex("ts")).getTime - T0))
      .sortBy(x => (x._2, x._1)).toSeq
    assert(alerts === Seq((0, 0L), (1, 6000L), (2, 81000L), (0, 90000L)),
      s"got $alerts")
  }

  test("curation landing is idempotent under foreachBatch re-delivery (mid-batch crash)") {
    // foreachBatch is at-least-once: a crash after the parquet write
    // but before the checkpoint commit re-delivers the batch with the
    // SAME id. landBatch must overwrite its own batch_id= directory,
    // never append a second copy of the docs.
    import graft.streaming.CurationPipeline
    import spark.implicits._
    val curatedDir = Files.createTempDirectory("cur_redeliver").toString
    val shed = new java.util.concurrent.atomic.AtomicLong
    def batch = Seq((1L, 0, "fp1", T0), (2L, 0, "fp2", T0 + 1000),
      (3L, 1, "fp3", T0 + 2000))
      .toDF("doc_id", "src_id", "fp", "ms")
      .select(col("doc_id"), col("src_id"), col("fp"),
        (col("ms") / 1000).cast("timestamp").as("ts"))
    // first delivery, then the re-delivery after a simulated crash
    CurationPipeline.landBatch(batch, 2, curatedDir, 7L, shed.addAndGet(_))
    CurationPipeline.landBatch(batch, 2, curatedDir, 7L, shed.addAndGet(_))
    val docs = spark.read.schema(CurationPipeline.curatedSchema)
      .parquet(curatedDir).collect()
    assert(docs.map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L),
      "landing zone must hold each kept doc exactly once (budget 2, oldest shed)")
    assert(docs.map(r => r.getLong(r.fieldIndex("batch_id"))).toSet === Set(7L))
    assert(shed.get() === 2L, "onShed is at-least-once by contract: fires per delivery")
  }

  test("latest-wins merge fails fast when the checkpoint was reset under a kept store") {
    // a committed version ABOVE the incoming batch id means batch ids
    // restarted from 0 (checkpoint deleted, store kept): merging would
    // silently fork state, so merge must abort loudly instead
    import graft.streaming.IncrementalPipelines.LatestWinsStore
    import spark.implicits._
    val storeDir = Files.createTempDirectory("q84reset").toString
    val batch = Seq((1L, 100L, 10L, "view", 100L))
      .toDF("user_id", "us", "event_id", "event_type", "cv")
    LatestWinsStore.merge(batch, storeDir, 5L) // store now holds committed v5
    val ex = intercept[IllegalArgumentException] {
      LatestWinsStore.merge(batch, storeDir, 0L) // restarted checkpoint: batch id 0
    }
    assert(ex.getMessage.contains("checkpoint was reset"))
    // the batch's own re-delivery (== id) must still be allowed
    LatestWinsStore.merge(batch, storeDir, 5L)
  }

  test("streaming incremental dedup (q91 shape): store anti-join + within-stream first-writer") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.IncrementalPipelines.DedupIngest
    import spark.implicits._
    // store already holds "alpha"
    val store = spark.range(1).select(md5(lit("alpha")).as("fp"))
    val docs = MemoryStream[(Long, String, Long)]
    val q = DedupIngest.start(
      docs.toDF().toDF("doc_id", "text", "ms")
        .select(col("doc_id"), col("text"),
          (col("ms") / 1000).cast("timestamp").as("ts")),
      store, "10 seconds", "q91kept",
      Files.createTempDirectory("ckpt_q91").toString)

    // doc 1 duplicates the store; docs 2 & 3 share text (first-writer
    // 2 wins); doc 4 is novel
    docs.addData((1L, "alpha", T0), (2L, "beta", T0 + 1000),
      (3L, "beta", T0 + 2000), (4L, "gamma", T0 + 3000))
    q.processAllAvailable()
    // a second micro-batch repeating "beta" within the watermark
    // horizon must still dedup against batch 1's state
    docs.addData((5L, "beta", T0 + 4000), (6L, "delta", T0 + 5000))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("q91kept").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(2L, 4L, 6L),
      "store dup and both within-stream dups must be dropped")
  }
}
