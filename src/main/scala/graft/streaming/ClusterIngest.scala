package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming incremental near-dup clustering — the continuous
  * deployment of [[Dedup.assignToClusters]]: every micro-batch of
  * incoming documents is assigned to existing clusters through the
  * persisted band-signature and component stores, and the
  * (doc_id, comp, batch_id) assignments land atomically per batch.
  *
  * The stream itself carries NO state (the checkpoint tracks offsets
  * only): all clustering state lives in the two bucketed stores,
  * refreshed out-of-band once per corpus version
  * ([[Dedup.writeBandStore]] / [[Dedup.writeComponentsStore]]) — so a
  * restart resumes instantly, and store refreshes roll out without
  * touching the query. Within-batch duplicates cluster against the
  * STORE only (each other at the next refresh) — the standard
  * incremental-LSH trade, documented on the operator.
  *
  * Input schema: (doc_id: Long, text: String).
  */
object ClusterIngest {

  val assignedSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, comp BIGINT, batch_id BIGINT")

  /** @param withinBatch also close each micro-batch's own pair graph
    *   (see [[Dedup.assignToClusters]]) — the right default for real
    *   ingest mixes, at the cost of a batch-sized propagation per
    *   trigger.
    */
  def start(docs: DataFrame, bandStore: DataFrame, compStore: DataFrame,
      outDir: String, checkpoint: String,
      withinBatch: Boolean = false): StreamingQuery = {
    // no batch is in flight yet for this landing zone — safe point to
    // drop orphaned .tmp/.old work dirs from earlier crashes
    AtomicLanding.sweepStale(docs.sparkSession, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val assigned = Dedup.assignToClusters(
          batch.sparkSession, batch, bandStore, compStore, withinBatch)
        AtomicLanding.publish(assigned, outDir, id)
      }
      .start()
  }

  /** [[start]] with the store pair resolved through the version
    * manifest ([[graft.stores.StoreManifest.currentRequired]], family
    * `dedup`): the deployment entry point — restarts pick up whatever
    * version is live at start; versions published mid-stream apply on
    * the next restart (the stream's checkpoint is offsets-only, so a
    * restart is cheap and state-free by design).
    */
  def startFromManifest(docs: DataFrame, manifest: String,
      outDir: String, checkpoint: String,
      withinBatch: Boolean = false): StreamingQuery = {
    val s = docs.sparkSession
    val (_, cur) =
      graft.stores.StoreManifest.currentRequired(s, manifest, "dedup")
    start(docs, s.table(cur("band")), s.table(cur("comp")),
      outDir, checkpoint, withinBatch)
  }

  /** Read everything assigned so far (committed batches only — the
    * hidden tmp dirs are invisible to the reader by construction).
    */
  def readAssigned(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    spark.read.schema(assignedSchema).parquet(outDir)
      .select(col("doc_id"), col("comp"), col("batch_id"))
}
