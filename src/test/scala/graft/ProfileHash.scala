package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session A/B of the native md5long expression vs the portable
  * conv(substr(md5)) chain it replaces (not a test; run via
  * Test/runMain graft.ProfileHash). Times the q95/q39 winnow hashing
  * shape — per-position 8-char hashes inside a transform() lambda
  * (interpreted, the hot-path evaluation mode) — and a plain
  * projection (codegen path), alternating arms to cancel drift.
  */
object ProfileHash {
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
    graft.functions.Md5Long.register(spark)

    val docs = Tables.parallel(spark, dir, "documents")
      .filter(length(col("text")) >= 11).localCheckpoint(true)
    docs.count()

    def run(label: String, e: String): Double = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      docs.select(expr(e).as("h")).agg(max(col("h"))).collect()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%.2f s")
      s
    }

    val lamOld = "aggregate(transform(sequence(1, length(text) - 7), i -> " +
      "cast(conv(substr(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))" +
      ", 0L, (a, x) -> a ^ x)"
    val lamNew = "aggregate(transform(sequence(1, length(text) - 7), i -> " +
      "md5long(substring(text, i, 8))), 0L, (a, x) -> a ^ x)"
    val projOld = "cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint)"
    val projNew = "md5long(text)"

    // alternate arms, 3 rounds each, report mins
    val t = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (_ <- 1 to 3) {
      for ((l, e) <- Seq(("lambda/chain", lamOld), ("lambda/md5long", lamNew),
        ("proj/chain", projOld), ("proj/md5long", projNew)))
        t(l) = math.min(t(l), run(l, e))
    }
    println("MIN " + t.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    spark.stop()
  }
}
