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

    // ---- in-verdict breakdown (round 16) --------------------------------
    // The wave-verdict term decomposed: wave 1's chain replayed in
    // three separately-checkpointed pieces so the decode / flag /
    // admission costs read apart (the aggregate "verdict" stage above
    // is the real fused plan; these pieces re-run pieces of it).
    import graft.operators.{Multimodal => MM, WebCuration => WC, TrainPrep => TP}
    val wave1 = files.filter(pmod(col("file_id"), lit(3L)) === 0L)
    val parsed = time("bd decode+clf+fp") {
      val p = TP.withClfScore(
        WC.parseWet(MM.frameCrawl(spark, MM.spreadClips(
          wave1.toDF("file_id", "payload")))), "body", None)
        .withColumn("clf_keep", col("clf_score") * 20 > col("n_feat"))
        .withColumn("fp", md5(col("body")))
        .select(col("file_id"), col("rec_idx"), col("url"), col("host"),
          col("path"), col("fp"), col("quality"), col("clf_score"),
          col("clf_keep"))
        .localCheckpoint()
      p.count(); p
    }
    val flagged = time("bd canon+store-probe") {
      val canon = parsed.groupBy(col("fp"))
        .agg(min(struct(col("file_id"), col("rec_idx"))).as("canon"))
      val f = parsed.withColumn("allowed", lit(true)).join(canon, "fp")
        .join(spark.table(fpT).filter(col("batch_id") < 4L)
          .select(col("fp")).withColumn("seen", lit(true)),
          Seq("fp"), "left")
        .select(col("file_id"), col("rec_idx"), col("url"), col("host"),
          col("fp"), col("quality"), col("clf_score"), col("clf_keep"),
          col("allowed"),
          coalesce(col("seen"), lit(false)).as("dup_of_store"),
          (col("canon.file_id") =!= col("file_id") ||
            col("canon.rec_idx") =!= col("rec_idx")).as("dup_in_batch"))
        .localCheckpoint()
      f.count(); f
    }
    time("bd admission") {
      val sofar = spark.table(hostT).filter(col("batch_id") < 4L)
        .groupBy(col("host")).agg(sum(col("n_admitted")).as("n_sofar"))
      val ranks = WC.hostRanks(
        flagged.filter(col("allowed"))
          .select(col("file_id"), col("rec_idx"), col("host")),
        B, Seq(col("file_id"), col("rec_idx")))
      Bench.force(flagged
        .join(ranks, Seq("file_id", "rec_idx", "host"), "left")
        .join(sofar, Seq("host"), "left")
        .select(col("file_id"), col("rec_idx"), col("host"),
          (col("allowed") && coalesce(col("rk"), lit(B + 1))
            + coalesce(col("n_sofar"), lit(0L)) <= B).as("admitted")))
    }

    // ---- admit rate + decode-stage decomposition (round 17) -------------
    // The round-16 verdict named decode (gunzip+parse+clf for EVERY
    // record) as q202's linear term and asked two questions: what
    // fraction of records does the admission window reject, and which
    // decode sub-stage carries the cost — the gunzip/framing floor
    // (irreducible: every record must be read once), or the
    // tokenize-based scoring (quality + clf) that admission doesn't
    // need and rejected records never use?
    val total = waves.map(_.count()).sum
    val admitted = waves.map(_.filter(col("admitted")).count()).sum
    println(f"admit rate${" "}%-18s $admitted / $total = " +
      f"${admitted.toDouble / total}%.5f")
    // each stage re-derives from `files` so timings compare
    // incrementally: sN − sN−1 is that sub-stage's own cost
    def framed = MM.frameCrawl(spark,
      MM.spreadClips(wave1.toDF("file_id", "payload")))
    time("st0 gunzip+frame") {
      Bench.force(framed.select(col("file_id"), col("rec_idx"),
        length(col("raw")).as("n")))
    }
    def hdr = framed
      .withColumn("m", col("raw").cast("string"))
      .withColumn("url", substring_index(col("m"), "\r\n\r\n", 1))
      .withColumn("body",
        col("m").substr(length(col("url")) + 5, length(col("m"))))
      .select(col("file_id"), col("rec_idx"), col("url"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"), col("body"))
    time("st1 +header/url") {
      Bench.force(hdr.select(col("file_id"), col("rec_idx"),
        col("host"), col("path")))
    }
    time("st2 +fp md5(body)") {
      Bench.force(hdr.select(col("file_id"), col("rec_idx"),
        col("host"), col("path"), md5(col("body")).as("fp")))
    }
    time("st3 +quality tokenize") {
      Bench.force(WC.parseWet(framed)
        .select(col("file_id"), col("rec_idx"), col("host"),
          col("path"), md5(col("body")).as("fp"), col("quality")))
    }
    time("st4 +clf score") {
      Bench.force(TP.withClfScore(WC.parseWet(framed), "body", None)
        .withColumn("clf_keep", col("clf_score") * 20 > col("n_feat"))
        .select(col("file_id"), col("rec_idx"), col("host"),
          col("path"), md5(col("body")).as("fp"), col("quality"),
          col("clf_score"), col("clf_keep")))
    }
    spark.stop()
  }
}
