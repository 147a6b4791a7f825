package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming video curation — decode AT INGEST: every micro-batch of
  * raw clip containers (YUV4MPEG2 bytes) runs the q187/q188 chain
  * once — partition-parallel decode at the mapPartitions seam, fused
  * `block_means64` per luma plane, per-frame dHash, detected shot
  * structure — and lands one row per clip: frame count, scene count,
  * longest shot, and a `contained` flag from the q189 containment
  * check against a reference keyframe table (the known-clip library:
  * a re-upload whose every detected scene signature matches one
  * reference clip is flagged before it reaches training).
  *
  * Contracts shared with the other ingests (SpanIngest / AnnIngest /
  * DfIngest): offsets-only checkpoint (all corpus knowledge lives in
  * the reference table, refreshed out-of-band), atomic per-batch
  * landing, restart resumes instantly. The shots frame is computed
  * ONCE per batch (localCheckpoint) and feeds both the stats and the
  * keyframe branch — decode is the dominant cost and must not run
  * twice.
  *
  * At 100 TB: decode is embarrassingly parallel (one clip never
  * crosses a partition); the containment probe is an equi-join on the
  * 64-bit scene signature against a signature-bucketed reference
  * table, and only keyframe rows (scenes, not frames) reach the join.
  * The q189 df cap (a boilerplate intro scene shared by >64 refs must
  * not fan out) belongs to the library MAINTENANCE side — apply it
  * when building/compacting the store, where its one aggregate over
  * the library amortizes across every served batch; the serving join
  * deliberately trusts the store rather than re-derive the cap per
  * micro-batch (that would re-scan the whole library every batch).
  *
  * Input schema: (doc_id: Long, clip: Array[Byte]).
  */
object MediaIngest {

  val statsSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, n_frames BIGINT, n_scenes BIGINT, " +
      "longest_shot BIGINT, contained BOOLEAN, batch_id BIGINT")

  def start(clips: DataFrame, refKeyframes: DataFrame,
      outDir: String, checkpoint: String): StreamingQuery = {
    val s = clips.sparkSession
    AtomicLanding.sweepStale(s, outDir)
    clips.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // batch_id is the landing partition (batch_id=<id> dir), not a
        // physical column — AtomicLanding's convention
        AtomicLanding.publish(score(s, batch, refKeyframes), outDir, id)
      }
      .start()
  }

  /** One batch's scoring — also the spec's batch-equivalence target.
    * Returns (doc_id, n_frames, n_scenes, longest_shot, contained).
    * Delegates to [[Multimodal.scoreAgainstKeyframes]] (the q192
    * operator) so streaming and batch share one plan.
    */
  private[graft] def score(s: SparkSession, batch: DataFrame,
      refKeyframes: DataFrame): DataFrame =
    Multimodal.scoreAgainstKeyframes(s, batch, refKeyframes)

  /** Maintain + score: each micro-batch SCORES against the library as
    * of the previous batch, then FOLDS its own keyframes in
    * ([[Multimodal.refreshKeyframeStore]] keyed by the micro-batch id
    * — exactly-once via the replay guard, the DfIngest fold-mode
    * contract: a crash-redelivered id is a refused no-op, a checkpoint
    * reset throws until `epochBase` is rebased). Score-BEFORE-fold is
    * load-bearing (round-12 advice fix): folding first made every
    * decodable clip match its own just-landed signatures, so
    * `contained` was vacuously true for novel clips and carried no
    * signal. Pre-fold scoring gives `contained` the same meaning as
    * serve mode — "this clip's scenes all existed before this batch"
    * — so a re-upload in a LATER batch is flagged by the earlier fold,
    * while a novel clip scores false.
    *
    * Crash convergence is order-independent: a crash after publish but
    * before the fold replays the id, re-scores against the same
    * pre-fold library (the fold never landed), republishes bit-for-bit
    * and then folds; a crash after the fold replays into a refused
    * fold no-op and a republish of the same pre-fold score, because
    * the score join filters reference rows to installments BELOW the
    * replayed id.
    */
  def startWithFold(clips: DataFrame, table: String,
      outDir: String, checkpoint: String,
      epochBase: Long = 0L): StreamingQuery = {
    val s = clips.sparkSession
    AtomicLanding.sweepStale(s, outDir)
    clips.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // foreachBatch ids start at 0; installments at 1 (0 marks the
        // base build). The reference side is pinned to installments
        // strictly below this batch's own — equivalent to reading the
        // store pre-fold, but ALSO correct on crash replay, where the
        // refused fold means this id's rows are already in the table
        // and must not self-match.
        val inst = epochBase + id + 1L
        val preFold = Multimodal.readKeyframeStoreBefore(s, table, inst)
        // decode ONCE per batch: score and fold share the spread +
        // materialized shots frame (decode dominates this pipeline)
        val shots = Multimodal.clipShots(s,
          Multimodal.spreadClips(batch.toDF("doc_id", "clip")))
          .localCheckpoint().transform(graft.Jobs.adaptiveRead(_))
        AtomicLanding.publish(
          Multimodal.scoreShotsAgainstKeyframes(shots, preFold),
          outDir, id)
        Multimodal.refreshKeyframeStoreFromShots(s, shots, table, inst)
        () // a refused fold (false) is the crash-replay no-op
      }
      .start()
  }

  /** [[start]] with the keyframe library resolved through the version
    * manifest — the production entry (readers cut over atomically on
    * `publish`, like the other manifest-resolved ingests).
    */
  def startFromManifest(clips: DataFrame, manifest: String,
      outDir: String, checkpoint: String): StreamingQuery = {
    val s = clips.sparkSession
    val (_, cur) =
      graft.stores.StoreManifest.currentRequired(s, manifest, "kf")
    start(clips, Multimodal.readKeyframeStore(s, cur("frames")),
      outDir, checkpoint)
  }

  /** Read everything landed so far (committed batches only). */
  def readStats(s: SparkSession, outDir: String): DataFrame =
    s.read.schema(statsSchema).parquet(outDir)
      .select(col("doc_id"), col("n_frames"), col("n_scenes"),
        col("longest_shot"), col("contained"), col("batch_id"))
}
