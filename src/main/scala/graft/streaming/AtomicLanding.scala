package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Atomic per-micro-batch parquet publication, shared by every
  * foreachBatch landing zone ([[CurationPipeline]], [[ClusterIngest]]):
  * write the batch to a hidden `.tmp` directory (invisible to Spark
  * file listers, including streaming file sources), then rename it
  * into place as `batch_id=<id>`.
  *
  * - ATOMIC visibility: a concurrent lister never observes a subset of
  *   the batch's part-files (on any filesystem with atomic rename —
  *   local, HDFS; object stores need a transactional table format).
  * - IDEMPOTENT re-delivery: foreachBatch re-runs the last uncommitted
  *   batch after a crash with the same id; the fresh tmp dir replaces
  *   the earlier attempt instead of appending it.
  * - NO VANISHING WINDOW on replay: when the crash landed between a
  *   successful publish and the checkpoint commit, the re-delivered
  *   batch finds `batch_id=<id>` already visible. The old attempt is
  *   renamed ASIDE (hidden `.old_batch_<id>`) rather than deleted, so
  *   a concurrent lister sees either the old or the new directory —
  *   never a gap where the batch's rows are absent; the aside copy is
  *   deleted only after the new rename succeeds (and restored if it
  *   fails).
  */
object AtomicLanding {

  /** @param partitionCols optional disk partitioning WITHIN the batch
    *   directory (e.g. AnnIngest's `cell=`): the published layout is
    *   `batch_id=<id>/col=<v>/…`, which Spark's partition discovery
    *   reads back as two partition columns — so readers keep
    *   partition pruning on `col` across every landed batch while the
    *   batch directory stays the atomic unit.
    */
  def publish(batch: DataFrame, rootDir: String, batchId: Long,
      partitionCols: Seq[String] = Nil): Unit = {
    val tmp = new Path(rootDir, s".tmp_batch_$batchId")
    val w = batch.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val fs = tmp.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    val dst = new Path(rootDir, s"batch_id=$batchId")
    val old = new Path(rootDir, s".old_batch_$batchId")
    fs.delete(old, true) // leftover aside from an earlier replay
    val hadOld = fs.exists(dst) && fs.rename(dst, old)
    if (!fs.rename(tmp, dst)) {
      // keep the previously-visible attempt visible instead of
      // leaving the batch absent
      if (hadOld) fs.rename(old, dst)
      throw new java.io.IOException(s"failed to publish $tmp -> $dst")
    }
    if (hadOld) fs.delete(old, true)
  }

  /** Sweep orphaned hidden work dirs (`.tmp_batch_*` from a mid-write
    * crash whose batch id is never replayed, `.old_batch_*` from a
    * crash inside [[publish]]'s aside window). Call at query START —
    * before any batch is in flight for this landing zone; a sweep
    * concurrent with an active publisher on the SAME rootDir could
    * remove its in-progress tmp dir.
    */
  def sweepStale(spark: org.apache.spark.sql.SparkSession,
      rootDir: String): Unit = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".tmp_batch_") || n.startsWith(".old_batch_"))
          fs.delete(st.getPath, true)
      }
  }
}
