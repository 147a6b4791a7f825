package graft

import org.apache.spark.sql.SparkSession

/** One-off A/B timing runner: times SparkEntry queries on an existing
  * corpus dir, min-of-N, same session config as ScaleBench. Works
  * against any repo HEAD's compiled classes (the queries API is
  * stable), so ABAB legs across worktrees compare code-vs-code in one
  * window.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(",")
    val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("qt_wh").toString)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- qs) {
      val ts = (1 to n).map { _ =>
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $q min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
