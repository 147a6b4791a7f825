package graft

import org.apache.spark.sql.SparkSession

/** Scratch: how much of an action is catalyst vs execution? Builds a
  * representative multi-join frame repeatedly and times (a) the
  * logical→executed plan derivation, (b) the action.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, dir, "documents").localCheckpoint(true)
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      // a fresh moderately-complex frame each round (new exprIds)
      val a = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val b = a.join(a.select(col("w"), col("c").as("c2")), "w")
        .join(broadcast(a.limit(10).select(col("w"))), Seq("w"), "left_semi")
        .groupBy(col("w")).agg(sum(col("c") * col("c2")).as("x"))
      val qe = b.queryExecution
      val t1 = System.nanoTime()
      qe.executedPlan // forces analysis+optimization+physical planning
      val t2 = System.nanoTime()
      Bench.force(b)
      val t3 = System.nanoTime()
      println(f"round $r  build=${(t1-t0)/1e6}%6.1f ms  plan=${(t2-t1)/1e6}%6.1f ms  exec=${(t3-t2)/1e6}%6.1f ms")
    }
    spark.stop()
  }
}
