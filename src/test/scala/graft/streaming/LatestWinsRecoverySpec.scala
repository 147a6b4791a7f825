package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-recovery semantics of [[IncrementalPipelines.LatestWinsStore]]'s
  * versioned store, driven through the `merge` seam foreachBatch calls:
  *
  *  - re-delivery of the last batch id (what foreachBatch does after
  *    every restart with an uncommitted batch) must merge from the
  *    PREDECESSOR version, not from its own previous output — reading
  *    `versions.max` there is a self-overwrite Spark rejects outright
  *    ("Cannot overwrite a path that is also being read from");
  *  - a version directory without `_SUCCESS` (a crashed half-write)
  *    must be invisible to `readStore` and to the merge base, and the
  *    re-delivered batch simply rewrites it.
  */
class LatestWinsRecoverySpec extends SparkSpec {

  import IncrementalPipelines.LatestWinsStore

  private def batchDf(rows: (Long, Long, Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_id", "event_type", "cv")
  }

  private def state(storeDir: String): Map[Long, (Long, Long)] =
    LatestWinsStore.readStore(spark, storeDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("re-delivered batch id is idempotent, not a self-overwrite crash") {
    val dir = Files.createTempDirectory("lw_redeliver").toString
    LatestWinsStore.merge(batchDf((1L, 100L, 10L, "view", 1L)), dir, 0L)
    val b1 = batchDf((1L, 200L, 11L, "click", 2L), (2L, 50L, 12L, "view", 3L))
    LatestWinsStore.merge(b1, dir, 1L)
    val expected = Map(1L -> (200L, 11L), 2L -> (50L, 12L))
    assert(state(dir) === expected)
    // restart scenario: foreachBatch re-runs batch 1. versions.max is
    // now 1 — merging from it would read the path being overwritten
    LatestWinsStore.merge(b1, dir, 1L)
    assert(state(dir) === expected, "re-delivery must reproduce, not compound")
  }

  test("half-written version (no _SUCCESS) is invisible and gets rewritten") {
    val dir = Files.createTempDirectory("lw_halfwrite").toString
    LatestWinsStore.merge(batchDf((1L, 100L, 10L, "view", 1L)), dir, 0L)
    val committed = state(dir)
    // simulate a crash mid-write of v1: valid parquet, marker removed
    LatestWinsStore.merge(batchDf((9L, 999L, 99L, "view", 9L)), dir, 1L)
    assert(Files.deleteIfExists(Paths.get(dir, "v1", "_SUCCESS")))
    assert(state(dir) === committed,
      "readStore must not serve a version without _SUCCESS")
    // re-delivery of batch 1 merges from v0 and rewrites v1 whole
    LatestWinsStore.merge(
      batchDf((1L, 150L, 13L, "late", 4L), (3L, 10L, 15L, "view", 5L)), dir, 1L)
    assert(state(dir) === Map(1L -> (150L, 13L), 3L -> (10L, 15L)))
  }
}
