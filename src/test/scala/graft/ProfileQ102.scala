package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q102 stage costs on the adversarial skew
  * corpus (not a test; run via Test/runMain graft.ProfileQ102):
  * rare-first list build, prefix explode, candidate join + distinct,
  * and the array-carrying verify joins — to see which stage owns the
  * time before touching the plan.
  */
object ProfileQ102 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-skew"
      else s"${System.getProperty("java.io.tmpdir")}/graft-skew")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    Tables.parallel(spark, dir, "documents").count() // warm

    val sh = time("1 hashed shingles distinct (ckpt)") {
      Tables.parallel(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
          .as("s"))
        .select(col("doc_id"), expr("md5long(s)").as("sid"))
        .distinct().localCheckpoint(true)
    }
    println(s"  sh rows: ${sh.count()}")

    val lists = time("2 rare-first lists (ckpt)") {
      val dfreq = sh.groupBy(col("sid")).agg(count(lit(1)).as("df"))
      sh.join(dfreq, "sid")
        .groupBy(col("doc_id"))
        .agg(expr("transform(sort_array(collect_list(struct(df, sid))), x -> x.sid)")
          .as("ts"))
        .withColumn("n", size(col("ts")))
        .localCheckpoint(true)
    }

    val pre = time("3 prefix explode (ckpt)") {
      lists.select(col("doc_id"), col("n"),
        explode(expr("slice(ts, 1, cast(n div 2 as int) + 1)")).as("psid"))
        .localCheckpoint(true)
    }
    println(s"  prefix rows: ${pre.count()}")

    val cands = time("4 candidate join + distinct (ckpt)") {
      pre.join(
          pre.select(col("psid"), col("doc_id").as("db"), col("n").as("nb2")), "psid")
        .filter(col("doc_id") < col("db")
          && greatest(col("n"), col("nb2")) <= lit(2) * least(col("n"), col("nb2")))
        .select(col("doc_id").as("da"), col("db")).distinct()
        .localCheckpoint(true)
    }
    println(s"  candidate rows: ${cands.count()}")

    time("5 verify joins + intersect (count)") {
      cands
        .join(lists.select(col("doc_id").as("da"), col("ts").as("ta"),
          col("n").as("na")), "da")
        .join(lists.select(col("doc_id").as("db"), col("ts").as("tb"),
          col("n").as("nb")), "db")
        .withColumn("o", size(array_intersect(col("ta"), col("tb"))))
        .filter(lit(3) * col("o") >= col("na") + col("nb")).count()
    }

    // variant: df via a sid-partitioned window count (q75 precedent) —
    // drops the dfreq aggregate AND the sid join
    time("2B lists via window df (ckpt)") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("sid"))
      sh.withColumn("df", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(expr("transform(sort_array(collect_list(struct(df, sid))), x -> x.sid)")
          .as("ts"))
        .withColumn("n", size(col("ts")))
        .localCheckpoint(true)
    }

    time("whole q102 (count)") {
      SparkEntry.queries("q102_prefix_join")(spark, dir).count()
    }
    spark.stop()
  }
}
