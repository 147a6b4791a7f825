package graft.streaming

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
  */
object AtomicLanding {

  def publish(batch: DataFrame, rootDir: String, batchId: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(rootDir, s".tmp_batch_$batchId")
    batch.write.mode("overwrite").parquet(tmp.toString)
    val fs = tmp.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(rootDir, s"batch_id=$batchId")
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"failed to publish $tmp -> $dst")
  }
}
