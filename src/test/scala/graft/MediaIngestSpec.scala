package graft

import java.nio.file.Files

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The streaming video-curation pipeline (q187/q188/q189 →
  * MediaIngest): decode at ingest, per-clip scene stats, and the
  * containment flag against a reference keyframe library. Pins:
  *
  *  1. the streamed landing equals the batch-side score (same clips,
  *     one pass through `MediaIngest.score`) — streaming adds
  *     plumbing, never semantics;
  *  2. a TRIMMED re-upload of a reference clip is flagged contained;
  *     a novel clip and a clip extending a reference (more scenes)
  *     are not;
  *  3. the landing is per-batch atomic and readable mid-stream
  *     (batch 1 visible before batch 2 is fed).
  */
class MediaIngestSpec extends SparkSpec {

  private def refIds = (1L to 20L)

  private def refKeyframes = {
    import spark.implicits._
    Multimodal.clipKeyframes(spark,
      refIds.map(g => (g, Multimodal.y4mClipBytes(g)))
        .toDF("doc_id", "clip"))
  }

  test("streamed landing equals batch score; containment flags exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ref = refKeyframes.cache()
    // batch 1: trims of ref clips 3 and 7 (contained), novel clip 100
    val b1 = Seq(
      (1003L, Multimodal.y4mClipBytes(3L, trim = true)),
      (1007L, Multimodal.y4mClipBytes(7L, trim = true)),
      (100L, Multimodal.y4mClipBytes(100L)))
    // batch 2: identical re-upload of ref 5 (contained — containment
    // admits equality), novel clip 101
    val b2 = Seq(
      (1005L, Multimodal.y4mClipBytes(5L)),
      (101L, Multimodal.y4mClipBytes(101L)))

    val src = MemoryStream[(Long, Array[Byte])]
    val outDir = Files.createTempDirectory("media_out").toString
    val ckpt = Files.createTempDirectory("media_ckpt").toString
    val q = graft.streaming.MediaIngest.start(
      src.toDF().toDF("doc_id", "clip"), ref, outDir, ckpt)
    try {
      src.addData(b1); q.processAllAvailable()
      val mid = graft.streaming.MediaIngest.readStats(spark, outDir)
      assert(mid.count() === 3, "batch 1 landed and readable mid-stream")
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val landed = graft.streaming.MediaIngest.readStats(spark, outDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(landed.size === 5)

    // 1. equals the batch-side score over the same clips
    val batchSide = graft.streaming.MediaIngest
      .score(spark, (b1 ++ b2).toDF("doc_id", "clip"), ref)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(landed === batchSide,
      "streamed landing must equal the one-pass batch score")

    // 2. containment semantics
    assert(landed(1003L)._4 && landed(1007L)._4,
      "trimmed re-uploads of reference clips must be contained")
    assert(landed(1005L)._4, "identical re-upload is contained")
    assert(!landed(100L)._4 && !landed(101L)._4,
      "novel clips must not be contained")

    // 3. stats are the real decode, not a stub: trim of clip 3
    // (nf=7, sl=3 -> scenes 3,3,1 -> trimmed to 6 frames, 2 scenes)
    assert(landed(1003L)._1 === 6L && landed(1003L)._2 === 2L)
  }

  test("fold mode grows the library at ingest; a later re-upload is caught") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def sweep(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    sweep("mi_fold_frames")
    Multimodal.writeKeyframeStore(spark,
      (1L to 5L).map(g => (g, Multimodal.y4mClipBytes(g)))
        .toDF("doc_id", "clip"),
      "mi_fold_frames", 4)

    // batch 1 carries a NOVEL clip (gid 50); batch 2 carries its
    // identical re-upload — containment must come from batch 1's FOLD
    val src = MemoryStream[(Long, Array[Byte])]
    val outDir = Files.createTempDirectory("mif_out").toString
    val ckpt = Files.createTempDirectory("mif_ckpt").toString
    val q = graft.streaming.MediaIngest.startWithFold(
      src.toDF().toDF("doc_id", "clip"), "mi_fold_frames", outDir, ckpt)
    try {
      src.addData(Seq((50L, Multimodal.y4mClipBytes(50L))))
      q.processAllAvailable()
      src.addData(Seq((9050L, Multimodal.y4mClipBytes(50L)),
        (9003L, Multimodal.y4mClipBytes(3L, trim = true))))
      q.processAllAvailable()
    } finally q.stop()

    val landed = graft.streaming.MediaIngest.readStats(spark, outDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    // 50 scores against the PRE-fold library (round-12 fix: fold-
    // before-score made every decodable clip match its own just-
    // landed signatures, so `contained` was vacuously true and
    // carried no signal) — novel, so NOT contained
    assert(!landed(50L),
      "a novel clip must not be flagged by its own batch's fold")
    assert(landed(9050L),
      "re-upload in a later batch must be caught by the earlier fold")
    assert(landed(9003L), "trim of a base-build clip caught")

    // the fold installments (batch ids 1, 2) are recorded: replays
    // are refused no-ops
    assert(!Multimodal.refreshKeyframeStore(spark,
      Seq((50L, Multimodal.y4mClipBytes(50L))).toDF("doc_id", "clip"),
      "mi_fold_frames", 1L))
    // and the library equals the batch recompute over everything fed
    val want = Multimodal.clipKeyframes(spark,
      ((1L to 5L).map(g => (g, Multimodal.y4mClipBytes(g))) ++
        Seq((50L, Multimodal.y4mClipBytes(50L)),
          (9050L, Multimodal.y4mClipBytes(50L)),
          (9003L, Multimodal.y4mClipBytes(3L, trim = true))))
        .toDF("doc_id", "clip"))
    val got = Multimodal.readKeyframeStore(spark, "mi_fold_frames")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "fold-mode library must equal the batch recompute")
  }

  test("a one-partition clip batch spreads across the cores before decode") {
    import spark.implicits._
    // the streaming shape: a micro-batch often lands in ONE partition,
    // and decode is the pipeline's dominant cost — a fat partition
    // would serialize the whole batch on one core (round-12 fix)
    val one = (1L to 50L).map(g => (g, Multimodal.y4mClipBytes(g)))
      .toDF("doc_id", "clip").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val cores = spark.sparkContext.defaultParallelism
    assert(Multimodal.spreadClips(one).rdd.getNumPartitions === cores,
      "a narrow batch must widen to the executor cores")
    // an already-wide batch passes through with no extra shuffle
    val wide = one.repartition(cores)
    assert(Multimodal.spreadClips(wide).rdd.getNumPartitions === cores)
  }

  test("a clip EXTENDING a reference is not contained (extra scene unmatched)") {
    import spark.implicits._
    // reference library holds the TRIMMED clip; the stream carries the
    // full one — its last scene has no reference match
    val refTrim = Multimodal.clipKeyframes(spark,
      Seq((3L, Multimodal.y4mClipBytes(3L, trim = true)))
        .toDF("doc_id", "clip"))
    val got = graft.streaming.MediaIngest.score(spark,
      Seq((9003L, Multimodal.y4mClipBytes(3L))).toDF("doc_id", "clip"),
      refTrim)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    assert(got(9003L) === false,
      "superset clip must not be contained in its trimmed reference")
  }
}
