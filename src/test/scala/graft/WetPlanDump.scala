package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the WET seam's per-wave verdict-chain plan (the frame
  * `wetVerdicts` returns BEFORE the caller pins it) — the final
  * declared frames of q202/q205/q206 are unions of checkpoints, so
  * their `explain` hides the chain the optimization work touches.
  * Usage: Test/runMain graft.WetPlanDump [sfDir] [near]
  */
object WetPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val near = args.length > 1 && args(1) == "near"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.CrawlIngest
    val (fpT, hostT) = ("wpd_fp", "wpd_hosts")
    val (bandT, compT) = ("wpd_bands", "wpd_comps")
    (Seq(fpT, hostT) ++ (if (near) Seq(bandT, compT) else Nil))
      .foreach { t =>
        Seq(t, t + "_wm").foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          val p = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), n)
          p.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(p, true)
        }
      }
    CrawlIngest.writeFpStoreEmpty(spark, fpT, 8)
    CrawlIngest.writeHostStore(spark, hostT, 8)
    if (near) CrawlIngest.writeNearStoresEmpty(spark, bandT, compT, 8)
    val files = graft.operators.WebCuration.wetFiles(spark, dir)
      .localCheckpoint()
    val v = CrawlIngest.wetVerdicts(spark, files, fpT, hostT, 10, 1L,
      None, if (near) Some((bandT, compT)) else None)
    v.explain("formatted")
    spark.stop()
  }
}
