package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming BM25 against the document-frequency store — the
  * continuous deployment of [[TextOps.bm25AgainstStore]] (q183's
  * operator), completing the ingest trio (SpanIngest: span quality,
  * AnnIngest: vector serving, DfIngest: retrieval stats).
  *
  * Two modes:
  *
  *  - [[start]] (serve-only): every micro-batch of documents is
  *    scored against the persisted store — batch-side tf/dl computed
  *    from the batch, every CORPUS statistic (df, n_docs, tot_dl, the
  *    top-df query terms) read from the store — and landed atomically
  *    per batch. Same statelessness contract as the other ingests:
  *    offsets-only checkpoint, store refreshed out-of-band, restarts
  *    resume instantly.
  *
  *  - [[startWithFold]] (maintain + serve): each micro-batch first
  *    FOLDS into the store ([[TextOps.refreshDfStore]] keyed by the
  *    micro-batch id) and then scores against the store that now
  *    includes it. Exactly-once maintenance rides the store's replay
  *    guard: foreachBatch re-delivers the last uncommitted batch with
  *    the SAME id after a crash, the guard refuses the recorded id as
  *    a no-op, and the landing republishes atomically — the
  *    double-count the naive fold would hit is structurally absent.
  *    After a checkpoint RESET (ids restart at 0) the guard throws on
  *    the non-monotone novel id; restart with `epochBase` rebased
  *    past the store watermark — the guard's documented contract.
  *
  * At 100 TB: the batch is delta-sized, the store reads are a
  * broadcast (5 query terms + 1 totals row) plus one bucketed scan
  * for the fold's guard column — nothing corpus-sized moves.
  */
object DfIngest {

  val scoreSchema: StructType = StructType.fromDDL(
    "term STRING, doc_id BIGINT, tf BIGINT, score DOUBLE, rk INT, " +
      "batch_id BIGINT")

  /** Serve-only: score each micro-batch against the persisted store.
    * Input schema: (doc_id: Long, text: String).
    */
  def start(docs: DataFrame, termsTable: String, statsTable: String,
      outDir: String, checkpoint: String): StreamingQuery = {
    val s = docs.sparkSession
    AtomicLanding.sweepStale(s, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AtomicLanding.publish(
          TextOps.bm25AgainstStore(s, batch, termsTable, statsTable),
          outDir, id)
      }
      .start()
  }

  /** Maintain + serve: fold each micro-batch into the store (replay-
    * guarded, exactly-once), then score it against the updated store.
    */
  def startWithFold(docs: DataFrame, termsTable: String,
      statsTable: String, outDir: String, checkpoint: String,
      epochBase: Long = 0L): StreamingQuery = {
    val s = docs.sparkSession
    AtomicLanding.sweepStale(s, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // foreachBatch ids start at 0; store installment ids start at
        // 1 (0 marks the base build) — shift by epochBase + 1. A
        // refused fold (false) is the crash-replay no-op; the scores
        // still republish so the landing converges too.
        TextOps.refreshDfStore(s, batch, termsTable,
          epochBase + id + 1L, statsTable)
        AtomicLanding.publish(
          TextOps.bm25AgainstStore(s, batch, termsTable, statsTable),
          outDir, id)
      }
      .start()
  }

  /** [[start]] with the df store resolved through the version
    * manifest (family `df`, roles `terms`/`stats`) — the serving
    * deployment's production entry.
    */
  def startFromManifest(docs: DataFrame, manifest: String,
      outDir: String, checkpoint: String): StreamingQuery = {
    val s = docs.sparkSession
    val (_, cur) =
      graft.stores.StoreManifest.currentRequired(s, manifest, "df")
    start(docs, cur("terms"), cur("stats"), outDir, checkpoint)
  }

  /** Read everything scored so far (committed batches only). */
  def readScores(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    spark.read.schema(scoreSchema).parquet(outDir)
      .select(col("term"), col("doc_id"), col("tf"), col("score"),
        col("rk"), col("batch_id"))
}
