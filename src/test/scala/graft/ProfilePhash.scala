package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q172's stage costs (Test/runMain). */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Tables(spark, dir, "documents").count()
    for (_ <- 1 to 3) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val probes = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("""concat(substring(text, 1, (1 + length(text) div 2) - 1), 'Z',
                 |       substring(text, (1 + length(text) div 2) + 1,
                 |                 length(text)))""".stripMargin).as("text"))
      val corpus = docs.unionByName(probes)
      time("0 corpus (count)") { corpus.count() }
      val base = corpus.select(col("doc_id"),
        hex(col("text").cast("binary")).as("hx"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      time("1 base hex (force)") { Bench.force(base) }
      graft.functions.BlockMeans.register(spark)
      val bm0 = corpus
        .select(col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          posexplode(expr("block_means64(text)")).as(Seq("blk", "bv")))
      time("2 block means native (force)") { Bench.force(bm0) }
      time("3 full phashFrame (force)") {
        Bench.force(graft.operators.Multimodal.phashFrame(corpus))
      }
      time("4 q172 as registered (force)") {
        Bench.force(SparkEntry.queries("q172_phash")(spark, dir))
      }
    }
    spark.stop()
  }
}
