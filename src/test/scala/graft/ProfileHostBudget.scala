package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q202_host_budget's 100× tail slope (round-15
  * verdict item 4; not a test — run via Test/runMain
  * graft.ProfileHostBudget [corpusDir] after ScaleBench has left
  * /dev/shm/graft-scale-{10x,100x} behind). Replays the q202 body —
  * three WET waves of verdicts + the four-fold family — with each
  * wave's pieces timed separately:
  *
  *   frame    — wetFiles framing + localCheckpoint (corpus decode)
  *   verdict  — wetVerdicts plan + localCheckpoint (store probes,
  *              admission window, budget join)
  *   fold     — foldWet (guard read + two bucketed appends)
  *   final    — the 3-wave union + Bench.force output hash
  *
  * Run it on the 10× and 100× corpora and compare per-stage ratios:
  * whichever stage's ratio tracks the corpus is the term behind the
  * 0.587 tail slope; the rest is the lifecycle constant the 2-point
  * exponent (0.312) measured.
  */
object ProfileHostBudget {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("phb_wh").toString)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/dev/shm/graft-scale-100x")
    import graft.streaming.CrawlIngest

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val B = 10
    val (fpT, hostT) = ("phb_fp", "phb_hosts")
    CrawlIngest.writeFpStoreEmpty(spark, fpT, 8)
    CrawlIngest.writeHostStore(spark, hostT, 8)
    val files = time("frame") {
      val f = graft.operators.WebCuration.wetFiles(spark, d).localCheckpoint()
      f.count(); f
    }
    val waves = (1 to 3).map { wv =>
      val wave = files.filter(
        pmod(col("file_id"), lit(3L)) === (wv - 1).toLong)
      val v = time(s"verdict wave$wv") {
        val x = CrawlIngest
          .wetVerdicts(spark, wave, fpT, hostT, B, wv.toLong)
          .localCheckpoint()
        x.count(); x
      }
      time(s"fold wave$wv") {
        require(CrawlIngest.foldWet(spark, v, fpT, hostT, wv.toLong))
      }
      v
    }
    time("final union+force") {
      Bench.force(waves.reduce(_ unionByName _)
        .select(col("file_id"), col("rec_idx"), col("host"),
          col("dup_of_store"), col("dup_in_batch"), col("admitted")))
    }
    spark.stop()
  }
}
