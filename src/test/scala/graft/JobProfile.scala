package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch job-count profiler: runs ONE SparkEntry query with a
  * listener recording every job's wall time and call site, so
  * lifecycle queries' scheduling constants read apart from their data
  * work. Usage: Test/runMain graft.JobProfile <query> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("JP_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("callSite.short"))
            .orElse(Option(e.properties.getProperty("spark.job.description")))
            .getOrElse("?") + " | stages=" + e.stageInfos.size + " tasks=" +
            e.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = starts.get(e.jobId)
        if (st != null)
          rows.add((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
      }
    })
    for (r <- 1 to reps) {
      rows.clear()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(q)(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_._1)
      println(f"==== rep $r  $q  wall=$wall%.2f  jobs=${rs.size}  jobsec=${rs.map(_._2).sum}%.2f")
      if (r == reps) {
        rs.foreach { case (id, t, cs) => println(f"  job $id%4d  $t%7.3f  $cs") }
        println("  -- by label --")
        rs.groupBy(_._3.takeWhile(_ != '|')).toSeq
          .map { case (l, js) => (l, js.size, js.map(_._2).sum) }
          .sortBy(-_._3)
          .foreach { case (l, n, t) => println(f"  $t%7.2f  n=$n%-3d  $l") }
      }
    }
    spark.stop()
  }
}
