package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q110_minhash_error's 100× tail slope (round-15
  * SCALEBENCH finding: 0.892, t100 74.4 s — the heaviest query in the
  * 100× suite; not a test — run via Test/runMain
  * graft.ProfileMinhashError [corpusDir] after ScaleBench has left
  * /dev/shm/graft-scale-{10x,100x} behind). The query returns ZERO
  * rows on the uniform scale corpus, so its entire cost is the
  * upstream scans — timed here piece by piece:
  *
  *   shingle  — hashedShingles (tokenize + md5 per k-gram) pinned
  *   sigs     — the 8-way minhash signature agg over the pin
  *   postings — the inverted index build + capped pair explode +
  *              intersection counts (jaccardPairs' candidate stage)
  *   cnt      — the per-doc distinct-shingle size scan
  *   join     — the sketch-vs-exact join-back on the (empty) pair set
  *
  * Whichever stage's 10×→100× ratio tracks the corpus is the linear
  * term; the current q110 body pays the shingle scan TWICE (once
  * under sigs, once under postings) plus the separate cnt text scan,
  * so the profile also measures what a shared pin would save.
  */
object ProfileMinhashError {
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
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val hs = time("shingle") {
      val x = Dedup.hashedShingles(spark, d).localCheckpoint(true)
      x.count(); x
    }
    val P = graft.functions.MinHashSignature.P
    val sigCols = (0 to 7).map { k =>
      val (a, b) = (graft.functions.MinHashSignature.A(k),
        graft.functions.MinHashSignature.B(k))
      min((lit(a) * (col("sid") % P) + lit(b)) % lit(P)).as(s"mh$k")
    }
    val sigs = time("sigs") {
      val x = hs.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .localCheckpoint(true)
      x.count(); x
    }
    val pairs = time("postings") {
      val x = hs
        .groupBy(col("sid"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, Dedup.JaccardDfCap))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("da", explode(col("ds")))
        .withColumn("db", explode(col("ds")))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("inter"))
        .localCheckpoint(true)
      println(s"  pair rows: ${x.count()}")
      x
    }
    val cnt = time("cnt") {
      val x = Tables(spark, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"),
          coalesce(size(array_distinct(expr(
            "transform(sequence(0, size(t)-3), i -> " +
              "concat_ws(' ', t[i], t[i+1], t[i+2]))"))), lit(0))
            .cast("long").as("n"))
        .localCheckpoint(true)
      x.count(); x
    }
    time("join") {
      val sa = sigs.select(col("doc_id").as("da") +:
        (0 to 7).map(k => col(s"mh$k").as(s"a$k")): _*)
      val sb = sigs.select(col("doc_id").as("db") +:
        (0 to 7).map(k => col(s"mh$k").as(s"b$k")): _*)
      val jac = pairs
        .join(cnt.withColumnRenamed("doc_id", "da_")
          .withColumnRenamed("n", "na"), col("da") === col("da_"))
        .join(cnt.withColumnRenamed("doc_id", "db_")
          .withColumnRenamed("n", "nb"), col("db") === col("db_"))
        .withColumn("jac",
          col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jac") >= 0.2)
      Bench.force(jac.join(sa, "da").join(sb, "db")
        .withColumn("matches",
          (0 to 7).map(k =>
            when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
            .reduce(_ + _))
        .select(col("da"), col("db")))
    }
    // reference: the CURRENT q110 body end-to-end (two shingle scans)
    time("q110-as-is") {
      Bench.force(SparkEntry.queries("q110_minhash_error")(spark, d))
    }
    spark.stop()
  }
}
