package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming duplicated-span coverage — the continuous deployment of
  * [[Dedup.spanCoverageAgainstStore]] (q166's operator): every
  * micro-batch of incoming documents scores its boilerplate/dup-span
  * coverage against the persisted (gid)-bucketed gram-frequency store
  * and lands (doc_id, n_tokens, dup_tokens, coverage) atomically per
  * batch. The quality gate this feeds is the span-level complement of
  * [[ClusterIngest]]'s document-level clustering: a doc can be
  * cluster-unique yet 80% boilerplate, and this is the stream that
  * says so before it reaches training.
  *
  * Same statelessness contract as the other incremental ingests: the
  * checkpoint tracks offsets only, all corpus knowledge lives in the
  * gram store ([[Dedup.writeGramStore]], refreshed out-of-band per
  * corpus version), so restarts resume instantly and store rollouts
  * never touch the stream. Within-batch duplicates DO mark each other
  * (batch_df counts them — q166 proves batch∪store marking equals the
  * full recompute); stored docs whose coverage a new batch raises stay
  * stale until the next store refresh, the documented trade shared
  * with assignment's bridge rule.
  *
  * Input schema: (doc_id: Long, text: String).
  */
object SpanIngest {

  val coverageSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, n_tokens BIGINT, dup_tokens BIGINT, " +
      "coverage DOUBLE, batch_id BIGINT")

  def start(docs: DataFrame, gramStore: DataFrame,
      outDir: String, checkpoint: String): StreamingQuery = {
    // no batch is in flight yet for this landing zone — safe point to
    // drop orphaned .tmp/.old work dirs from earlier crashes
    AtomicLanding.sweepStale(docs.sparkSession, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AtomicLanding.publish(
          Dedup.spanCoverageAgainstStore(batch, gramStore), outDir, id)
      }
      .start()
  }

  val strippedSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, n_tokens BIGINT, dup_tokens BIGINT, coverage DOUBLE, " +
      "n_kept BIGINT, clean_text STRING, clean_fp BIGINT, batch_id BIGINT")

  /** The strip deployment — [[Dedup.stripAgainstStore]] (q175's
    * operator) per micro-batch: lands coverage AND the cleaned text
    * (islands stripped for docs whose coverage exceeds
    * `minCoverage`), with the md5long fingerprint of the rebuilt
    * text alongside so every landed batch is rewrite-PROVABLE without
    * re-reading it. Same contracts as [[start]]: offsets-only
    * checkpoint, atomic per-batch landing, store refreshed
    * out-of-band.
    */
  def startWithStrip(docs: DataFrame, gramStore: DataFrame,
      outDir: String, checkpoint: String,
      minCoverage: Double = 0.0): StreamingQuery = {
    AtomicLanding.sweepStale(docs.sparkSession, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AtomicLanding.publish(
          Dedup.stripAgainstStore(batch, gramStore, minCoverage),
          outDir, id)
      }
      .start()
  }

  /** [[startWithStrip]] with the gram store resolved through the
    * version manifest — the strip deployment's production entry.
    */
  def startWithStripFromManifest(docs: DataFrame, manifest: String,
      outDir: String, checkpoint: String,
      minCoverage: Double = 0.0): StreamingQuery = {
    val s = docs.sparkSession
    val (_, cur) =
      graft.stores.StoreManifest.currentRequired(s, manifest, "gram")
    startWithStrip(docs, Dedup.readGramStore(s, cur("grams")),
      outDir, checkpoint, minCoverage)
  }

  /** Read everything stripped so far (committed batches only). */
  def readStripped(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    spark.read.schema(strippedSchema).parquet(outDir)
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        col("coverage"), col("n_kept"), col("clean_text"), col("clean_fp"),
        col("batch_id"))

  /** [[start]] with the gram store resolved through the version
    * manifest (family `gram`, role `grams`) — sum-on-read over the
    * live table, same restart-to-adopt contract as
    * [[ClusterIngest.startFromManifest]].
    */
  def startFromManifest(docs: DataFrame, manifest: String,
      outDir: String, checkpoint: String): StreamingQuery = {
    val s = docs.sparkSession
    val (_, cur) =
      graft.stores.StoreManifest.currentRequired(s, manifest, "gram")
    start(docs, Dedup.readGramStore(s, cur("grams")), outDir, checkpoint)
  }

  /** Read everything scored so far (committed batches only). */
  def readCoverage(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    spark.read.schema(coverageSchema).parquet(outDir)
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        col("coverage"), col("batch_id"))
}
