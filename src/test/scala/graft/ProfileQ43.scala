package graft

import org.apache.spark.sql.SparkSession

/** Same-session A/B for the q43 IVF wobble (flagged two rounds
  * running: +0.47 s r5→r6, +0.35 s r7→r8 with untouched code). Runs
  * the shipped arm (centroids re-derived per consumer) against the
  * pinned arm (`spark.graft.q43.pinCentroids` → localCheckpoint of
  * the 16-row trained-centroid frame), alternating arms to cancel
  * drift, under the bench harness confs, with host load recorded
  * into the output — the cross-round deltas were measured on a
  * shared box, so any verdict needs the load context attached (not a
  * test; run via Test/runMain graft.ProfileQ43).
  */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val load0 = Bench.hostLoad()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(pin: Boolean): Double = {
      spark.conf.set("spark.graft.q43.pinCentroids", pin.toString)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(500)
      val t0 = System.nanoTime()
      SparkEntry.queries("q43_ivf_ann")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup of both arms (codegen + scan)
    runOnce(pin = false); runOnce(pin = true)

    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (round <- 1 to 5; pin <- Seq(false, true)) {
      val label = if (pin) "pinned" else "shipped"
      val t = runOnce(pin)
      times(label) ::= t
      println(f"round $round $label%-8s $t%.3f s")
    }
    val summary = times.toSeq.sortBy(_._1).map { case (k, ts) =>
      f"$k min=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f"
    }.mkString("  ")
    println(s"Q43AB $summary${Bench.loadJson(load0)}")
    spark.stop()
  }
}
