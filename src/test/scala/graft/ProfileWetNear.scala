package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the near-mode WET seam (not a test; run via
  * Test/runMain graft.ProfileWetNear). Reproduces StreamBench's
  * wet_ingest feed (500 files/batch × 8 members, 1:1 re-crawl/novel
  * mix) against pre-warmed stores and times one batch's pieces in
  * isolation, to attribute the measured near-vs-exact per-batch delta
  * (round-13 verdict item 1):
  *
  *  1. decode+parse+clf+fp, pinned  (shared by both modes)
  *  2. bandSignatures over the pinned bodies, pinned   (near only)
  *  3. assignFromBands (store joins + within-batch propagate)
  *  4. the nv verdict-join chain + admission + landing pin
  *  5. the four folds, timed individually
  */
object ProfileWetNear {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("pwn_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- the StreamBench wet feed, verbatim shape ----
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0))
    def gz(t: String): Array[Byte] =
      graft.operators.Multimodal.gzipBytes(t.getBytes("UTF-8"))
    def novel(i: Long, k: Int): String =
      (0 until 40).map(w => s"cw${(i * 53 + k * 17 + w * 7) % 99991}")
        .mkString(" ")
    def file(i: Long): (Long, Array[Byte]) =
      (6000000L + i, (0 until 8).toArray.flatMap { k =>
        val body =
          if ((i + k) % 2 == 0) corpus(((i + k) / 2 % corpus.length).toInt)
          else novel(i, k)
        gz(s"https://h${(i * 8 + k) % 50}.example.org/p${i * 8 + k}" +
          "\r\n\r\n" + body)
      })
    def batchDf(lo: Long, hi: Long): DataFrame =
      (lo until hi).map(file).toDF("file_id", "payload")

    import graft.streaming.CrawlIngest
    CrawlIngest.writeFpStoreEmpty(spark, "fps_p")
    CrawlIngest.writeHostStore(spark, "hosts_p")
    CrawlIngest.writeNearStoresEmpty(spark, "bands_p", "comps_p")
    val near = Some(("bands_p", "comps_p"))
    // warm the stores with two prior batches (the bench's steady state)
    (0 until 2).foreach { b =>
      val v = CrawlIngest.wetVerdicts(spark, batchDf(b * 500L, b * 500L + 500L),
        "fps_p", "hosts_p", 500, b + 1L, None, near).localCheckpoint()
      CrawlIngest.foldWet(spark, v, "fps_p", "hosts_p", b + 1L, near)
    }
    println(s"warm: bands=${spark.table("bands_p").count()} " +
      s"comps=${spark.table("comps_p").count()} " +
      s"fps=${spark.table("fps_p").count()}")

    // ---- batch 3, pieces in isolation (mirrors wetVerdicts' near arm) ----
    val inst = 3L
    val files = batchDf(1000L, 1500L)

    // exact-mode whole-batch reference
    val vExact = time("A. exact: wetVerdicts + pin") {
      CrawlIngest.wetVerdicts(spark, files, "fps_p", "hosts_p", 500,
        inst, None, None).localCheckpoint()
    }
    time("A2. exact: foldWet (fp+host)") {
      CrawlIngest.foldWet(spark, vExact, "fps_p", "hosts_p", inst, None)
    }
    // rebuild stores state for the near run at inst 4
    val inst2 = 4L
    val files2 = batchDf(1500L, 2000L)

    val parsed = time("B1. decode+parse+clf+fp + pin (full)") {
      graft.operators.TrainPrep.withClfScore(
        graft.operators.WebCuration.parseWet(
          graft.operators.Multimodal.frameCrawl(spark,
            graft.operators.Multimodal.spreadClips(
              files2.toDF("file_id", "payload")))), "body")
        .withColumn("clf_keep", col("clf_score") * 20 > col("n_feat"))
        .withColumn("fp", md5(col("body")))
        .withColumn("ck", col("file_id") * 1000000L + col("rec_idx"))
        .localCheckpoint(true)
    }
    val newBands = time("B2. bandSignatures + pin") {
      graft.operators.Dedup.bandSignatures(
        parsed.select(col("ck").as("doc_id"), col("body").as("text")))
        .localCheckpoint(true)
    }
    // split assignFromBands internals: store joins vs within-batch
    // label propagation vs the final merge
    time("B3i. store joins (matches+storeCand)") {
      val matches = newBands
        .select(col("doc_id").as("new_id"), col("band"), col("h1"), col("h2"))
        .join(spark.table("bands_p").filter(col("batch_id") < inst2)
          .select(col("doc_id"), col("band"), col("h1"), col("h2")),
          Seq("band", "h1", "h2"))
        .select(col("new_id"), col("doc_id").as("old_id"))
        .distinct()
      matches
        .join(spark.table("comps_p").filter(col("batch_id") < inst2)
          .select(col("doc_id"), col("comp"))
          .withColumnRenamed("doc_id", "old_id")
          .withColumnRenamed("comp", "old_comp"), Seq("old_id"), "left")
        .select(col("new_id"),
          coalesce(col("old_comp"), col("old_id")).as("cand"))
        .groupBy(col("new_id")).agg(min(col("cand")).as("comp")).count()
    }
    time("B3ii. pairsFromBands + propagate (bcomp)") {
      graft.operators.Dedup.propagate(
        graft.operators.Dedup.pairsFromBands(newBands))._1.count()
    }
    val assigned = time("B3. assignFromBands (incl. propagate)") {
      val a = graft.operators.Dedup.assignFromBands(spark, newBands,
        parsed.select(col("ck").as("doc_id")),
        spark.table("bands_p").filter(col("batch_id") < inst2)
          .select(col("doc_id"), col("band"), col("h1"), col("h2")),
        spark.table("comps_p").filter(col("batch_id") < inst2)
          .select(col("doc_id"), col("comp")),
        withinBatch = true)
      a.localCheckpoint(true)
    }
    println(s"   assigned rows: ${assigned.count()}")
    val vNear = time("B4. full near wetVerdicts + pin (all joins)") {
      CrawlIngest.wetVerdicts(spark, files2, "fps_p", "hosts_p", 500,
        inst2, None, near).localCheckpoint()
    }
    time("B5a. fold: bands refresh") {
      graft.stores.DeltaStore.refresh(spark,
        vNear.select((col("file_id") * 1000000L + col("rec_idx")).as("doc_id"),
          explode(col("bands")).as("b"))
          .select(col("b.band").as("band"), col("b.h1").as("h1"),
            col("b.h2").as("h2"), col("doc_id")),
        "bands_p", Seq("band", "h1", "h2"), inst2)
    }
    time("B5b. fold: comps refresh") {
      graft.stores.DeltaStore.refresh(spark,
        vNear.select((col("file_id") * 1000000L + col("rec_idx")).as("doc_id"),
          col("near_comp").as("comp")),
        "comps_p", Seq("doc_id"), inst2)
    }
    time("B5c. fold: fps") {
      CrawlIngest.refreshFpStore(spark, files2.limit(0), "fps_p", 99L)
      graft.stores.DeltaStore.refresh(spark,
        vNear.select(col("fp")).distinct()
          .join(spark.table("fps_p").filter(col("batch_id") < inst2)
            .select(col("fp")), Seq("fp"), "left_anti"),
        "fps_p", Seq("fp"), inst2)
    }
    time("B5d. fold: hosts") {
      graft.stores.DeltaStore.refresh(spark,
        vNear.filter(col("admitted"))
          .groupBy(col("host")).agg(count(lit(1)).as("n_admitted")),
        "hosts_p", Seq("host"), inst2)
    }
    spark.stop()
  }
}
