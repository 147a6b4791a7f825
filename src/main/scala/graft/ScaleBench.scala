package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Uniform scale-growth bench (round-13 verdict item): everything else
  * is measured at sf0.1 (17 MB) plus targeted 10× SKEW shapes, so the
  * 100 TB claims rested on plan shapes alone — this harness measures
  * how the heaviest corpus-scaling queries actually GROW. It
  * synthesizes a uniform corpus (the [[SkewBench]] generator WITHOUT
  * the adversarial blocks: no boilerplate prefix, no hot LSH cluster,
  * no planted pairs, no hot embedding block) at 1× driver scale
  * (sf0.1: 5 000 docs / 2 000 vecs) and at 10×, times each target at
  * both, and records the per-query growth exponent
  * e = ln(t₁₀/t₁) / ln(10) — linear scaling ⇒ e ≈ 1, a constant-
  * dominated query ⇒ e < 1, anything super-linear is a scale bug
  * unless attributed.
  *
  * Known index-build constants (documented, NOT scale bugs): q171
  * runs 16 sequential vocabulary passes by construction (its cost is
  * passes × corpus, linear in corpus with a large constant); the IVF
  * family (q43/q117/q130/q155/q161) trains/loads k-means centroids
  * whose iteration count is fixed — their data-path cost is linear,
  * their training constant is not tied to corpus size. The wet
  * machinery (q202/q205/q206/q207) stages fixed store DDL per run
  * (the q183-class driver-bound lifecycle cost), so small exponents
  * there mean the constant dominates at 1×.
  *
  * Deterministic (hash-derived from ids), same timing discipline as
  * [[SkewBench]]: ContextCleaner drain + min-of-repeat + Bench.force.
  * Emits one JSON line (and SCALEBENCH_OUT.json) with t1/t10/exponent
  * per query and result-row counts at both scales (rows must scale
  * with the corpus or the run degenerated).
  */
object ScaleBench {

  /** Uniform corpus: schema-identical to the driver tables
    * (TESTDATA.md), zero adversarial structure.
    */
  def writeUniform(spark: SparkSession, dir: String, nDocs: Long,
      nVecs: Long): Unit = {
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 59),
             |  i -> concat('w', pmod(hash(id, i), 997))))""".stripMargin)
        .as("text"),
      expr("CASE WHEN id % 10 = 0 THEN 'de' ELSE 'en' END").as("lang"),
      expr("concat('src', pmod(id, 19))").as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val vecs = spark.range(nVecs).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), i -> cast(
             |  (pmod(hash(id, i), 2000) - 1000) / 1000.0 + 0.0005
             |  as float))""".stripMargin).as("embedding"),
      expr("cast(pmod(id, 8) as int)").as("label"))
    vecs.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  /** The heaviest corpus-scaling queries of the round-12 bench that
    * run on (documents, embeddings) alone — metadata-bound lifecycle
    * scenarios (q174/q184/q186) are excluded by design: their cost is
    * catalog churn, constant in data volume.
    */
  val Targets: Seq[String] = Seq(
    // web/crawl machinery (incl. the round-13 near-dup + classifier)
    "q202_host_budget", "q203_web_pipeline", "q205_wet_rules",
    "q206_wet_neardup", "q207_wet_classifier",
    // text/stores
    "q171_bpe_batched", "q183_bm25_store", "q197_bpe_tokenize",
    "q95_winnow_pairs", "q102_prefix_join", "q104_bigram_lm",
    // incremental dedup closure family
    "q142_incremental_assign", "q151_incremental_within",
    "q152_refresh_closure", "q153_pending_bridges", "q156_refresh_churn",
    "q110_minhash_error",
    // ANN family (embeddings)
    "q43_ivf_ann", "q117_ivfpq_recall", "q130_probe_curve",
    "q155_ivf_incremental_search", "q161_ivf_retrain_churn",
    // cross-modal capstone
    "q191_multimodal_curation")

  private def runAll(spark: SparkSession, dir: String,
      repeat: Int): Map[String, (Double, Long)] =
    Targets.flatMap(n => Seq.fill(repeat)(n)).map { name =>
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(500)
      val t0 = System.nanoTime()
      val n = Bench.force(SparkEntry.queries(name)(spark, dir))
      (name, (System.nanoTime() - t0) / 1e9, n)
    }.groupBy(_._1).map { case (n, rs) =>
      n -> ((rs.map(_._2).min, rs.map(_._3).max))
    }

  def main(args: Array[String]): Unit = {
    val loadAtStart = Bench.hostLoad()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-scale"
      else s"${System.getProperty("java.io.tmpdir")}/graft-scale")
    val docs1 = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "5000").toLong
    val vecs1 = sys.env.getOrElse("SPARK_GRAFT_SCALE_VECS", "2000").toLong
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val repeat = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPEAT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val subset = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    val sel = Targets.filter(n => subset.forall(_.contains(n)))

    writeUniform(spark, s"$base-1x", docs1, vecs1)
    writeUniform(spark, s"$base-${factor}x", docs1 * factor, vecs1 * factor)
    val t1 = runAll(spark, s"$base-1x", repeat)
      .filter { case (k, _) => sel.contains(k) }
    val tN = runAll(spark, s"$base-${factor}x", repeat)
      .filter { case (k, _) => sel.contains(k) }

    def jmap(f: String => String): String =
      sel.filter(t1.contains).map(k => "\"" + k + "\":" + f(k))
        .mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_total_${factor}x","value":${
        sel.filter(tN.contains).map(tN(_)._1).sum},"unit":"sec",""" +
        s""""factor":$factor,"docs1":$docs1,"vecs1":$vecs1,""" +
        s""""t1":${jmap(k => (math.rint(t1(k)._1 * 1000) / 1000).toString)},""" +
        s""""t${factor}":${jmap(k => (math.rint(tN(k)._1 * 1000) / 1000).toString)},""" +
        s""""exponent":${jmap { k =>
          val e = math.log(tN(k)._1 / t1(k)._1) / math.log(factor.toDouble)
          (math.rint(e * 1000) / 1000).toString
        }},""" +
        s""""rows1":${jmap(k => t1(k)._2.toString)},""" +
        s""""rows${factor}":${jmap(k => tN(k)._2.toString)}""" +
        s"""${Bench.loadJson(loadAtStart)}}"""
    println(json)
    System.err.println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALEBENCH_OUT.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
