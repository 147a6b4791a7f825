package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Golden scenario for the streaming heavy-hitters operator: exact
  * top-k per finalized sliding window, late data dropped by the
  * watermark, every window ranked exactly once.
  */
class TrendingTermsSpec extends SparkSpec {

  // window-aligned base (multiple of both 60s and 30s)
  private val T0 = 1700000040000L

  test("sliding-window top-k finalizes exactly once with exact counts") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF()
      .select(timestamp_millis(col("_1")).as("ts"), col("_2").as("text"))
    val got = ArrayBuffer.empty[Row]
    val q = TrendingTerms.start(docs, k = 2, watermark = "0 seconds",
      win = "60 seconds", slide = "30 seconds",
      Files.createTempDirectory("ckpt_trend").toString,
      b => got.synchronized { got ++= b.collect() })
    try {
      // all events inside [T0, T0+60): covered by the sliding windows
      // [T0-30, T0+30) and [T0, T0+60) and (for the +2s event only if
      // it crossed T0+30 — it does not) nothing else
      in.addData((T0 + 1000L, "a a a b b c"), (T0 + 2000L, "a b d"))
      q.processAllAvailable()
      assert(got.isEmpty, "nothing finalizes before the watermark moves")

      // advance the watermark far past both windows
      in.addData((T0 + 600000L, "z"))
      q.processAllAvailable()
      val byWin = got.synchronized {
        got.map(r => ((r.getTimestamp(0).getTime, r.getTimestamp(1).getTime),
          (r.getString(2), r.getLong(3), r.getInt(4)))).groupBy(_._1)
      }
      assert(byWin.keySet === Set((T0 - 30000L, T0 + 30000L),
        (T0, T0 + 60000L)),
        s"both covering windows finalize, no others: ${byWin.keySet}")
      // identical content in both windows: a:4 b:3 (c, d cut at k=2)
      byWin.values.foreach { rows =>
        assert(rows.map(_._2).toSet === Set(("a", 4L, 1), ("b", 3L, 2)),
          rows.mkString(";"))
      }

      // late arrival (behind the watermark): dropped, nothing re-emits
      val before = got.synchronized(got.size)
      in.addData((T0 + 3000L, "a a a a a a"))
      q.processAllAvailable()
      assert(got.synchronized(got.size) === before,
        "late data behind the watermark must not re-open a window")
    } finally q.stop()
  }

  test("restart from checkpoint neither re-finalizes nor drops windows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("ckpt_trend_rs").toString
    val got = ArrayBuffer.empty[Row]
    def sink(b: org.apache.spark.sql.DataFrame): Unit =
      got.synchronized { got ++= b.collect() }
    def winStarts = got.synchronized(
      got.map(_.getTimestamp(0).getTime).toSet)

    val in = MemoryStream[(Long, String)]
    val docs = in.toDF()
      .select(timestamp_millis(col("_1")).as("ts"), col("_2").as("text"))
    def start() = TrendingTerms.start(docs, k = 1, watermark = "0 seconds",
      win = "60 seconds", slide = "60 seconds", ckpt, sink)

    val q1 = start()
    in.addData((T0 + 1000L, "a a b"))
    q1.processAllAvailable()
    in.addData((T0 + 90000L, "c"))   // watermark passes window 1
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = got.synchronized(got.size)
    assert(afterFirst === 1 && winStarts === Set(T0),
      s"window 1 finalized exactly once before the restart: $got")

    // restart from the same checkpoint and source; new data advances
    // the watermark past the c-window
    val q2 = start()
    try {
      in.addData((T0 + 200000L, "d"))
      q2.processAllAvailable()
      assert(winStarts === Set(T0, T0 + 60000L),
        s"the c-window must finalize after restart, once: $winStarts")
      assert(got.synchronized(got.count(_.getTimestamp(0).getTime == T0)) === 1,
        s"window 1 must not re-finalize across the restart: $got")
    } finally q2.stop()
  }
}
