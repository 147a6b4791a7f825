package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q95's winnow pipeline on the ScaleBench 100×
  * corpus (not a test; run via Test/runMain graft.ProfileWinnow after
  * a ScaleBench run has left /dev/shm/graft-scale-100x behind).
  * Times the fingerprint projection and the inverted-index/pair
  * stages separately, and counts the intermediates that drive the
  * pair explosion — distinct fps, postings in the df ∈ [2, 64] band,
  * and the Σ C(df, 2) pair volume — for both the native KR winnow
  * and the pre-round-15 md5-per-position formulation, to attribute
  * where a hash-scheme change moves the cost.
  */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/dev/shm/graft-scale-100x")
    val docs = Tables.parallel(spark, d, "documents")
      .filter(length(col("text")) >= 11)
      .localCheckpoint(true)

    def stats(name: String, fpsDf: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val f = fpsDf.localCheckpoint(true)
      val nFps = f.count()
      val tFps = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val post = f.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .localCheckpoint(true)
      val agg = post.agg(
        count(lit(1)).as("distinct_fp"),
        sum(when(col("df").between(2, 64), col("df") * (col("df") - 1) / 2)
          .otherwise(0L)).as("pairs_in_band"),
        sum(when(col("df") > 64, 1L).otherwise(0L)).as("over_cap"),
        max(col("df")).as("max_df")).head()
      val tPost = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val pairs = f.join(post.filter(col("df").between(2, 64)), "fp")
        .groupBy(col("fp"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .repartition(4 * spark.sparkContext.defaultParallelism)
        .withColumn("da", explode(col("ds")))
        .withColumn("db", explode(col("ds")))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .count()
      val tPairs = (System.nanoTime() - t2) / 1e9
      println(f"$name%-6s fps_sec=$tFps%.2f post_sec=$tPost%.2f " +
        f"pairs_sec=$tPairs%.2f n_fps=$nFps " +
        s"distinct_fp=${agg.getLong(0)} band_pairs=${agg.getAs[Any](1)} " +
        s"over_cap=${agg.getAs[Any](2)} max_df=${agg.getAs[Any](3)} " +
        s"surviving_pairs=$pairs")
      f.unpersist()
      post.unpersist()
    }

    if (args.contains("pairs")) {
      // A/B the pair-generation shape on the KR fingerprints:
      //   SET  — groupBy(fp).collect_set + double explode (the q95
      //          shape): every intermediate row after the first
      //          explode carries the FULL posting array (≤ 64 longs),
      //          so the generate stage copies ~df × array bytes per
      //          posting.
      //   JOIN — filter fps to in-band keys (broadcast the ~0.5M key
      //          set), then a slim (fp, doc_id) self-join: the join
      //          streams C(df, 2) pairs without array copies.
      val f = docs.select(col("doc_id"),
        explode(expr("winnow_fps(text)")).as("fp")).localCheckpoint(true)
      f.count()
      (1 to 2).foreach { i =>
        System.gc(); Thread.sleep(300)
        var t0 = System.nanoTime()
        val setPairs = f.groupBy(col("fp"))
          .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
          .filter(size(col("ds")).between(2, 64))
          .repartition(4 * spark.sparkContext.defaultParallelism)
          .withColumn("da", explode(col("ds")))
          .withColumn("db", explode(col("ds")))
          .filter(col("da") < col("db"))
          .groupBy(col("da"), col("db"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2).count()
        println(f"SET$i  ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$setPairs")
        System.gc(); Thread.sleep(300)
        t0 = System.nanoTime()
        val ok = f.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 64))
          .select(col("fp"))
        val fok = f.join(broadcast(ok), "fp")
        val joinPairs = fok.as("a")
          .join(fok.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2).count()
        println(f"JOIN$i ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$joinPairs")
      }
    } else if (args.contains("query")) {
      // end-to-end q95 exactly as ScaleBench times it (Bench.force
      // over the registered query), twice, to separate first-run
      // JIT/readahead from the steady state
      (1 to 2).foreach { i =>
        System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(500)
        val t0 = System.nanoTime()
        val n = Bench.force(SparkEntry.queries("q95_winnow_pairs")(spark, d))
        println(f"QUERY$i q95 ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    } else {
      stats("MD5", docs
        .select(col("doc_id"), expr(
          "transform(sequence(1, length(text) - 7), i -> " +
            "md5long(substring(text, i, 8)))").as("khs"))
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(khs) - 3), j -> array_min(slice(khs, j, 4)))")))
          .as("fp")))
      stats("KR", docs.select(col("doc_id"),
        explode(expr("winnow_fps(text)")).as("fp")))
      stats("KR2", docs.select(col("doc_id"),
        explode(expr("winnow_fps(text)")).as("fp")))
    }
    spark.stop()
  }
}
