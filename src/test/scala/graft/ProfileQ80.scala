package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for q80 stage costs (not a test; run via
  * Test/runMain graft.ProfileQ80). Reproduces the IVFADC subtrees
  * inline so each can be timed in isolation: coarse assignment
  * (corpus × 16 centroids argmax), PQ encode (corpus × 8 subspaces ×
  * 16 codes argmin), probe selection, distance table, and the final
  * candidate ADC join.
  */
object ProfileQ80 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CosineSimilarity.register(spark)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }

    val e = Tables(spark, d, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    e.count(); e.count() // warm

    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val scored = e.select(col("vec_id"), col("v").as("qv"))
      .crossJoin(broadcast(seeds))
      .withColumn("csim", expr("cosine_sim(qv, cv)"))
    val assign = scored.groupBy(col("vec_id"))
      .agg(max(expr(
        "floor(csim * 4503599627370496d) * 16 + (15 - cent_id)")).as("k"))
      .select(col("vec_id"), (lit(15L) - pmod(col("k"), lit(16L))).as("cell"))

    def pqSplit(df: org.apache.spark.sql.DataFrame, idAs: String) =
      df.select(col("vec_id").as(idAs), explode(expr(
        "transform(sequence(0, 7), m -> struct(m AS m, slice(v, m*8+1, 8) AS sv))"))
        .as("x"))
        .select(col(idAs), col("x.m").cast("long").as("m"), col("x.sv").as("sv"))
    def dot(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
    val pqD2 = expr(dot("sv", "sv")) - lit(2.0) * expr(dot("sv", "cbv")) +
      expr(dot("cbv", "cbv"))

    val cb = pqSplit(e.filter(col("vec_id") < 16), "code")
      .withColumnRenamed("sv", "cbv")
    val codes = pqSplit(e, "c_id")
      .join(broadcast(cb), "m")
      .withColumn("d2", pqD2)
      .groupBy(col("c_id"), col("m"))
      .agg(min(expr("floor(d2 * 1125899906842624d) * 64 + code")).as("k"))
      .select(col("c_id"), col("m"), pmod(col("k"), lit(64L)).as("code"))

    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(expr("floor(csim * 4503599627370496d)").desc, col("cent_id").asc)
    val probes = scored.filter(col("vec_id") < 10)
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("cent_id").as("probe_cell"))

    val dtab = pqSplit(e.filter(col("vec_id") < 10), "q_id")
      .join(broadcast(cb), "m")
      .withColumn("dfx", (round(pqD2 * lit(1099511627776d), 0)).cast("bigint"))
      .select(col("q_id"), col("m"), col("code"), col("dfx"))

    val cands = probes
      .join(assign, col("probe_cell") === col("cell")
        && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"))

    time("seeds")(seeds.count())
    time("assign (corpus argmax)")(assign.count())
    time("assign again")(assign.count())
    time("codes (corpus PQ encode)")(codes.count())
    time("codes again")(codes.count())
    time("probes")(probes.count())
    time("dtab")(dtab.count())
    time("cands (probes x assign)")(cands.count())

    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("afx").asc, col("c_id").asc)
    val full = codes.join(broadcast(cands), "c_id")
      .join(broadcast(dtab), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("dfx")).as("afx"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
    time("full q80 (1)")(full.count())
    time("full q80 (2)")(full.count())
    time("production q80 (1)")(SparkEntry.queries("q80_ivfpq")(spark, d).count())
    time("production q80 (2)")(SparkEntry.queries("q80_ivfpq")(spark, d).count())
    spark.stop()
  }
}
