package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q95 stage costs on the adversarial skew corpus
  * (not a test; run via Test/runMain graft.ProfileQ95). Reproduces the
  * winnow-pair subtrees inline so each can be timed in isolation:
  *
  *  1. fingerprint projection (per-position md5 + conv + window-min) —
  *     the hashing stage;
  *  2. per-doc fingerprint totals (cnt);
  *  3. inverted-index build (groupBy fp + collect_set + df cap);
  *  4. candidate pair explode + pair partial-aggregate;
  *  5. the final totals joins + containment filter.
  *
  * Stage 1 is materialized via localCheckpoint exactly as the query
  * does, so stages 2-5 time their own work, not a re-hash.
  */
object ProfileQ95 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-skew"
      else s"${System.getProperty("java.io.tmpdir")}/graft-skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$dir/documents.parquet").exists())
      SkewBench.writeCorpus(spark, dir, 50000L, 20000L)

    def time[T](label: String)(f: => T): T = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the scan
    Tables.parallel(spark, dir, "documents").count()

    // stage 1a: raw k-gram hashes only (md5+conv per char position)
    time("1a khs hash only (count)") {
      Tables.parallel(spark, dir, "documents")
        .filter(length(col("text")) >= 11)
        .select(col("doc_id"), expr(
          "transform(sequence(1, length(text) - 7), i -> " +
            "cast(conv(substr(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))")
          .as("khs"))
        .select(sum(size(col("khs")))).collect()
    }

    // stage 1b: + window-min + distinct + explode (the full projection)
    val fps = time("1b full fp projection (ckpt)") {
      Tables.parallel(spark, dir, "documents")
        .filter(length(col("text")) >= 11)
        .select(col("doc_id"), expr(
          "transform(sequence(1, length(text) - 7), i -> " +
            "cast(conv(substr(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))")
          .as("khs"))
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(khs) - 3), j -> array_min(slice(khs, j, 4)))")))
          .as("fp"))
        .localCheckpoint(true)
    }
    println(s"  fps rows: ${fps.count()}")

    val cnt = time("2 per-doc totals (ckpt)") {
      fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).localCheckpoint(true)
    }

    val postings = time("3 inverted index + df cap (ckpt)") {
      fps.groupBy(col("fp"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 64))
        .localCheckpoint(true)
    }
    println(s"  postings rows: ${postings.count()}")

    val pairs = time("4 pair explode + agg, 4x spread as shipped (ckpt)") {
      postings
        .repartition(4 * spark.sparkContext.defaultParallelism)
        .withColumn("da", explode(col("ds")))
        .withColumn("db", explode(col("ds")))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("shared"))
        .localCheckpoint(true)
    }
    println(s"  pair rows: ${pairs.count()}")

    time("5 totals joins + filter (count)") {
      pairs.filter(col("shared") >= 2)
        .join(cnt.withColumnRenamed("doc_id", "da_").withColumnRenamed("n", "na"),
          col("da") === col("da_"))
        .join(cnt.withColumnRenamed("doc_id", "db_").withColumnRenamed("n", "nb"),
          col("db") === col("db_"))
        .filter(col("shared") / least(col("na"), col("nb")) >= 0.5)
        .count()
    }

    // variant B: posexplode + suffix slice — emits exactly C(df,2)
    // rows (no da<db filter) at the cost of materializing a suffix
    // array per outer element
    time("4B posexplode + slice (ckpt)") {
      postings
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "da")))
        .select(col("da"),
          explode(expr("slice(ds, i + 2, size(ds))")).as("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("shared"))
        .localCheckpoint(true)
    }

    // variant C: double explode at 4x the shuffle width (is the final
    // agg the bottleneck, or the generate?)
    time("4C double explode, 128 parts (ckpt)") {
      postings
        .repartition(128)
        .withColumn("da", explode(col("ds")))
        .withColumn("db", explode(col("ds")))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("shared"))
        .localCheckpoint(true)
    }

    time("whole q95 (count)") {
      SparkEntry.queries("q95_winnow_pairs")(spark, dir).count()
    }
    spark.stop()
  }
}
