package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Unbounded (streaming) formulations of the two round-4 batch
  * operators whose natural deployment is continuous — the reference's
  * whole point is unbounded operation on event streams
  * (BiometricAlertStreamProcessor.scala:38–41); these give the CDC
  * compaction (q84) and incremental dedup (q91) semantics the same
  * treatment.
  */
object IncrementalPipelines {

  /** q84's latest-wins compaction as a `foreachBatch` merge: the
    * stream itself carries NO aggregation state (the checkpoint tracks
    * offsets only) — each micro-batch is collapsed to one candidate
    * per key with a struct-max PARTIAL aggregate (the shuffle carries
    * |batch keys| rows, not |batch events|), then merged with the
    * persisted store by the same keyed struct-max, and the result is
    * written as a NEW store version named by the batch id.
    *
    * Versioned directories + last-version resolution make the merge
    * idempotent: a batch merges from the greatest version STRICTLY
    * BELOW its own batch id — never `versions.max` — so a re-delivered
    * batch (foreachBatch re-runs the last uncommitted batch after
    * every restart) recomputes its version from the same predecessor
    * instead of reading the very path it is about to overwrite (which
    * Spark rejects: "Cannot overwrite a path that is also being read
    * from"), and never compounds its own output. Version directories
    * without a `_SUCCESS` marker are ignored everywhere — a crashed
    * half-write is invisible to readers and simply rewritten by the
    * re-delivery. The poor man's snapshot isolation a lakehouse table
    * format provides natively; swap [[readStore]]/`saveVersion` for a
    * MERGE INTO on such a table in production. At 100 TB the store is
    * a bucketed
    * table on the key, so the merge's store side arrives
    * co-partitioned (no exchange) and each version rewrites only the
    * buckets the batch touches.
    *
    * Input schema: (user_id: Long, us: Long, event_id: Long,
    * event_type: String, cv: Long) — q84's changelog projection;
    * (us, event_id) is the unique latest-wins order.
    */
  object LatestWinsStore {

    private val payload =
      struct(col("us"), col("event_id"), col("event_type"), col("cv"))

    /** Committed versions only: a directory without parquet's
      * `_SUCCESS` marker is a crashed half-write and must never be
      * served as authoritative state.
      */
    private def versions(spark: SparkSession, storeDir: String): Seq[Long] = {
      val root = new java.io.File(storeDir)
      if (!root.exists()) Seq.empty
      else root.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("v")
          && new java.io.File(f, "_SUCCESS").exists())
        .map(_.getName.drop(1).toLong)
    }

    private def storeAt(spark: SparkSession, storeDir: String,
        vs: Seq[Long]): DataFrame =
      if (vs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "user_id BIGINT, us BIGINT, event_id BIGINT, " +
              "event_type STRING, cv BIGINT"))
      else spark.read.parquet(s"$storeDir/v${vs.max}")

    /** The current compacted state: one row per key, the latest
      * (us, event_id) payload. Empty-schema-compatible before the
      * first batch lands.
      */
    def readStore(spark: SparkSession, storeDir: String): DataFrame =
      storeAt(spark, storeDir, versions(spark, storeDir))

    /** The keyed latest-wins merge itself: store FULL OUTER JOIN
      * batch-compacted on the key, `greatest` of the two payload
      * structs (null-skipping, so a key on one side only keeps that
      * side). Semantically identical to union + keyed struct-max —
      * both sides carry one row per key — but join-shaped on purpose:
      * with the store persisted as a table bucketed on the key, the
      * corpus-sized store side arrives co-partitioned and only the
      * BATCH side shuffles (a union + groupBy re-shuffles the whole
      * store every micro-batch). BucketedStoreSpec pins that plan.
      */
    def mergeFrames(store: DataFrame, batch: DataFrame): DataFrame = {
      val compacted = batch
        .groupBy(col("user_id")).agg(max(payload).as("cb"))
      store.select(col("user_id"), payload.as("sb"))
        .join(compacted, Seq("user_id"), "full_outer")
        .select(col("user_id"), greatest(col("sb"), col("cb")).as("b"))
        .select(col("user_id"), col("b.us").as("us"),
          col("b.event_id").as("event_id"),
          col("b.event_type").as("event_type"), col("b.cv").as("cv"))
    }

    private[graft] def merge(batch: DataFrame, storeDir: String,
        batchId: Long): Unit = {
      val spark = batch.sparkSession
      val vs = versions(spark, storeDir)
      // A committed version ABOVE the incoming batch id means the
      // checkpoint was reset/relocated while the store was kept: batch
      // ids restarted from 0, so this merge would base on an empty (or
      // ancient) predecessor and write a low version that readStore
      // ignores — state silently forking. Fail loudly instead; == is
      // fine (the batch's own crashed re-delivery).
      require(!vs.exists(_ > batchId),
        s"LatestWinsStore at $storeDir has committed version " +
          s"v${vs.max} > incoming batch id $batchId: the streaming " +
          "checkpoint was reset while the store was kept. Clear or " +
          "migrate the store directory (or restore the checkpoint) " +
          "before restarting.")
      // merge base: greatest committed version STRICTLY before this
      // batch id — on re-delivery vs.max == batchId, the path this
      // merge overwrites
      val base = vs.filter(_ < batchId)
      mergeFrames(storeAt(spark, storeDir, base), batch)
        .write.mode("overwrite").parquet(s"$storeDir/v$batchId")
    }

    def start(events: DataFrame, storeDir: String,
        checkpoint: String): StreamingQuery =
      events.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch((batch: DataFrame, id: Long) =>
          merge(batch, storeDir, id))
        .start()
  }

  /** q91's incremental dedup against a persisted store, unbounded:
    * within-stream first-writer-wins via
    * `dropDuplicatesWithinWatermark` on the content fingerprint
    * (exact-once per fp while the watermark holds, state bounded by
    * the watermark horizon — the plain `dropDuplicates` would grow
    * state forever on an unbounded corpus), then a stream-static LEFT
    * ANTI join against the store fingerprint set: survivors are the
    * documents worth ingesting. At 100 TB the store is corpus-sized —
    * never broadcastable — so the static side is a bucketed
    * fingerprint table and the join a co-partitioned sort-merge, the
    * same posture as batch q91; locally Spark is free to broadcast
    * the small fixture store.
    *
    * Input schema: (doc_id: Long, text: String, ts: Timestamp);
    * `store`: (fp: String).
    */
  object DedupIngest {
    def kept(docs: DataFrame, store: DataFrame,
        watermark: String): DataFrame =
      docs.withColumn("fp", md5(col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("fp"))
        .join(store, Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"), col("ts"))

    def start(docs: DataFrame, store: DataFrame, watermark: String,
        sinkTable: String, checkpoint: String): StreamingQuery =
      kept(docs, store, watermark).writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .format("memory").queryName(sinkTable)
        .start()
  }
}
