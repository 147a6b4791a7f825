package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q165 stage costs at sf0.1 (not a test; run
  * via Test/runMain graft.ProfileQ165): q165 reads ~2 s in-suite
  * where sibling q164 — which runs the SAME mark-and-merge island
  * chain — reads ~0.15 s, so the delta must live in the report half:
  * the token-array join, the span-string construction/group, or the
  * countDistinct expand. Each stage is timed cumulatively (checkpoint
  * boundaries) to locate the owner before touching the plan.
  */
object ProfileQ165 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // mirror Bench/SkewBench: tmpfs shuffle dirs, or the stage
      // timings measure /tmp writeback stalls instead of the plan
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    Tables(spark, dir, "documents").count() // warm

    for (pass <- 1 to 3) {
      println(s"-- pass $pass")
      // stage 1: the island chain alone (what q164 pays)
      val isl = time("1 dupIslands -> (doc, island, a, b) ckpt") {
        graft.operators.Dedup.profileIslands(spark, dir).localCheckpoint(true)
      }
      println(s"   islands: ${isl.count()}")
      // stage 2: + token-array join + span construction
      val spans = time("2 + token join + span strings (ckpt)") {
        val docs = Tables(spark, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        isl.join(docs, "doc_id")
          .select(col("doc_id"),
            concat_ws(" ", slice(col("t"), col("a"),
              (col("b") - col("a") + 1).cast("int"))).as("span"),
            (col("b") - col("a") + 1).as("len"))
          .localCheckpoint(true)
      }
      println(s"   spans: ${spans.count()}")
      // stage 3: + group/filter/top-20
      time("3 + span group + top-20 (collect)") {
        spans.groupBy(col("span"))
          .agg(max(col("len")).as("len"), count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_occ") >= 2)
          .withColumn("savings", (col("n_occ") - 1) * col("len"))
          .orderBy(col("savings").desc, col("span"))
          .limit(20).collect()
      }
      // reference: the full q165 as registered
      time("4 full q165 (collect)") {
        SparkEntry.queries("q165_boilerplate_spans")(spark, dir).collect()
      }
      // calibration: sibling q164 (same island chain, no report half)
      time("5 q164 as registered (count)") {
        SparkEntry.queries("q164_dup_span_coverage")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
