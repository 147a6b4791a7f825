package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** [[Dedup.compactStore]]: the maintenance job that keeps the
  * append-only store discipline of refreshStores viable long-term.
  * Pins the three claims the operator makes:
  *   1. semantics — the compacted table is exactly DISTINCT(store),
  *      so a crash-replayed refresh append (the one writer that can
  *      duplicate rows) is healed;
  *   2. IO shape — exactly one parquet file per non-empty bucket
  *      afterward, regardless of how many refresh appends piled up;
  *   3. plan shape — the rewrite never shuffles (the forced bucketed
  *      scan's partitioning satisfies the full-row distinct's
  *      clustering: bucket cols ⊆ grouping cols), and consumers see
  *      the compacted table as the same co-partitioned store.
  */
class StoreCompactionSpec extends SparkSpec {

  private def parquetFiles(table: String): Int = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(loc))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Marker files in a store's watermark-sidecar DIRECTORY (the
    * round-16 sidecar shape — not a catalog table, so no metadata
    * lookup; the path is the warehouse slot `<table>_wm`).
    */
  private def wmMarkers(table: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier(table + "_wm")))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir)
      .count(st => scala.util.Try(st.getPath.getName.toLong).isSuccess)
  }

  test("compaction collapses replayed appends to one file per bucket with no shuffle") {
    val wh = Files.createTempDirectory("graft_wh_cp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS cpstore LOCATION '$wh'")
    try {
      Dedup.writeBandStore(spark, sf001, "cpstore.bands")
      Dedup.writeComponentsStore(spark, sf001, "cpstore.comps")
      val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt

      // one real refresh append + the SAME batch replayed (a crash
      // between the store append and the checkpoint commit re-runs
      // the refresh) — the band store now carries duplicate rows and
      // 3 generations of files
      import spark.implicits._
      val srcText = Tables(spark, sf001, "documents")
        .filter(col("doc_id") === 0).collect().head.getString(1)
      val batch = Seq((1000000L, srcText),
        (1000001L, (0 until 40).map(i => s"cp$i").mkString(" ")))
        .toDF("doc_id", "text")
      Dedup.refreshStores(spark, batch, "cpstore.bands",
        "cpstore.comps", "cpstore.comps_v2")
      Dedup.refreshStores(spark, batch, "cpstore.bands",
        "cpstore.comps_v2", "cpstore.comps_v3")

      val rows = spark.table("cpstore.bands").count()
      val distinctRows = Dedup.compacted(spark, "cpstore.bands").count()
      assert(rows > distinctRows, "the replayed append must leave duplicates")
      val filesBefore = parquetFiles("cpstore.bands")
      assert(filesBefore > buckets,
        s"appends must accumulate files (got $filesBefore for $buckets buckets)")

      Dedup.compactStore(spark, "cpstore.bands", "cpstore.bands_c")

      // 1. semantics: exactly DISTINCT(store)
      assert(spark.table("cpstore.bands_c").count() === distinctRows)
      assert(spark.table("cpstore.bands_c")
        .except(spark.table("cpstore.bands")).isEmpty)
      assert(spark.table("cpstore.bands")
        .except(spark.table("cpstore.bands_c")).isEmpty)

      // 2. IO shape: one file per non-empty bucket
      val filesAfter = parquetFiles("cpstore.bands_c")
      assert(filesAfter <= buckets,
        s"expected <= $buckets files after compaction, got $filesAfter")

      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      val autoB = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prevAuto = spark.conf.get(autoB, "true")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set(autoB, "false")

        // 3a. the rewrite itself is exchange-free
        val plan = Dedup.compacted(spark, "cpstore.bands")
          .queryExecution.executedPlan
        assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"compaction must not shuffle:\n$plan")

        // 3b. consumers: the compacted store serves assignToClusters
        // with the same no-store-side-shuffle plan and the same labels
        val batch2 = Seq((2000000L, srcText)).toDF("doc_id", "text")
        val viaOld = Dedup.assignToClusters(spark, batch2,
          spark.table("cpstore.bands"), spark.table("cpstore.comps_v3"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val assigned = Dedup.assignToClusters(spark, batch2,
          spark.table("cpstore.bands_c"), spark.table("cpstore.comps_v3"))
        val viaNew = assigned
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaNew === viaOld, "compaction must not change assignments")
        val joins = assigned.queryExecution.executedPlan
          .collect { case j: SortMergeJoinExec => j }
        val bandJoin = joins.find(_.leftKeys.size == 3)
        assert(bandJoin.isDefined, "expected the 3-key band join")
        assert(bandJoin.get.right.collect {
          case e: ShuffleExchangeExec => e
        }.isEmpty, "compacted band store side must not shuffle")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set(autoB, prevAuto)
      }
    } finally spark.sql("DROP DATABASE IF EXISTS cpstore CASCADE")
  }

  test("a crash-replayed refresh is label-exact; compaction restores the clean store") {
    // the full crash-recovery story for refreshStores: a refresh
    // whose store appends landed but whose checkpoint commit was lost
    // re-runs with the SAME batch. The replayed delta graph resolves
    // through the already-refreshed stores, so every label comes out
    // unchanged (the closure is a fixpoint of its own refresh); the
    // only residue is duplicate rows from the double append — exactly
    // what compactStore heals.
    val wh = Files.createTempDirectory("graft_wh_rp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS rpstore LOCATION '$wh'")
    try {
      Dedup.writeBandStore(spark, sf001, "rpstore.bands")
      Dedup.writeComponentsStore(spark, sf001, "rpstore.comps")
      import spark.implicits._
      val srcText = Tables(spark, sf001, "documents")
        .filter(col("doc_id") === 0).collect().head.getString(1)
      val twin = (0 until 40).map(i => s"rp$i").mkString(" ")
      val batch = Seq((1000000L, srcText), (2000000L, twin),
        (2000001L, twin)).toDF("doc_id", "text")

      Dedup.refreshStores(spark, batch, "rpstore.bands",
        "rpstore.comps", "rpstore.comps_v2")
      val v2 = spark.table("rpstore.comps_v2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // REPLAY: same batch folded again (the refresh re-runs against
      // stores that already contain it)
      Dedup.refreshStores(spark, batch, "rpstore.bands",
        "rpstore.comps_v2", "rpstore.comps_v3")
      val v3rows = spark.table("rpstore.comps_v3")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // every (doc_id -> comp) mapping is unchanged...
      v3rows.foreach { case (id, c) =>
        assert(v2.get(id) === Some(c),
          s"replayed refresh must not move doc $id (v2 ${v2.get(id)}, v3 $c)")
      }
      assert(v3rows.map(_._1).toSet === v2.keySet)
      // ...but the double append leaves duplicate rows (the residue)
      assert(v3rows.length > v2.size,
        "the replay is expected to leave duplicate rows behind")

      // compaction heals both stores back to clean
      Dedup.compactStore(spark, "rpstore.comps_v3", "rpstore.comps_v4")
      val v4rows = spark.table("rpstore.comps_v4")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(v4rows.length === v4rows.toMap.size, "one row per doc after compaction")
      assert(v4rows.toMap === v2, "compacted replay store equals the clean v2")
      Dedup.compactStore(spark, "rpstore.bands", "rpstore.bands_c")
      assert(spark.table("rpstore.bands_c").count() ===
        Dedup.compacted(spark, "rpstore.bands").count())

      // and the healed stores still assign: a fresh twin clone joins
      // the (once-deferred, now-folded) twin cluster
      val a = Dedup.assignToClusters(spark,
        Seq((3000000L, twin)).toDF("doc_id", "text"),
        spark.table("rpstore.bands_c"), spark.table("rpstore.comps_v4"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a(3000000L) === 2000000L)
    } finally spark.sql("DROP DATABASE IF EXISTS rpstore CASCADE")
  }

  test("installment file accrual is O(n) on key table AND wm sidecar; one compaction restores both") {
    // the declared small-files trade (round-13 verdict item 5): every
    // refresh appends per-bucket files to the key table and ONE 1-row
    // file to the watermark sidecar — this pins the accrual really is
    // linear and that a single roll collapses the key table to one
    // file per bucket and the sidecar to one file
    val wh = Files.createTempDirectory("graft_wh_sf").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS sfstore LOCATION '$wh'")
    try {
      import spark.implicits._
      import graft.stores.DeltaStore
      val t = "sfstore.kv"
      DeltaStore.write(spark,
        Seq((1L, 10L)).toDF("k", "n"), t, Seq("k"), 2)
      val n = 6
      (1 to n).foreach { i =>
        assert(DeltaStore.refresh(spark,
          Seq((i.toLong % 3, 1L)).toDF("k", "n"), t, Seq("k"), i.toLong))
      }
      val keyFiles = parquetFiles(t)
      val wmFiles = wmMarkers(t)
      assert(wmFiles === n + 1,
        s"the sidecar accrues one marker per installment (got $wmFiles)")
      assert(keyFiles >= n,
        s"the key table accrues per-installment file sets (got $keyFiles)")
      DeltaStore.compact(spark, t, t + "_c",
        DeltaStore.readSum(spark, t, Seq("k"), Seq("n")), Seq("k"))
      assert(parquetFiles(t + "_c") <= 2,
        "post-roll: one file per non-empty bucket")
      assert(wmMarkers(t + "_c") === 1,
        "post-roll: the carried watermark is ONE sidecar marker")
      // and the carried watermark still guards: last pre-roll id refused
      assert(!DeltaStore.refresh(spark,
        Seq((9L, 9L)).toDF("k", "n"), t + "_c", Seq("k"), n.toLong))
    } finally spark.sql("DROP DATABASE IF EXISTS sfstore CASCADE")
  }

  test("compaction refuses unbucketed tables and in-place rewrites (however spelled)") {
    val wh = Files.createTempDirectory("graft_wh_cpu").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS cpflat LOCATION '$wh'")
    try {
      import spark.implicits._
      Seq((1L, 2L)).toDF("a", "b").write
        .format("parquet").saveAsTable("cpflat.flat")
      Seq((1L, 2L)).toDF("a", "b").write
        .bucketBy(2, "a").sortBy("a")
        .format("parquet").saveAsTable("cpflat.bkt")
      intercept[IllegalArgumentException] {
        Dedup.compactStore(spark, "cpflat.flat", "cpflat.flat_c")
      }
      intercept[IllegalArgumentException] {
        Dedup.compactStore(spark, "cpflat.bkt", "cpflat.bkt")
      }
      // qualified-vs-unqualified and case-variant spellings of the
      // SAME table must also be refused (the guard resolves names
      // before comparing)
      val prevDb = spark.catalog.currentDatabase
      spark.catalog.setCurrentDatabase("cpflat")
      try {
        intercept[IllegalArgumentException] {
          Dedup.compactStore(spark, "cpflat.bkt", "bkt")
        }
        intercept[IllegalArgumentException] {
          Dedup.compactStore(spark, "cpflat.bkt", "cpflat.BKT")
        }
      } finally spark.catalog.setCurrentDatabase(prevDb)
    } finally spark.sql("DROP DATABASE IF EXISTS cpflat CASCADE")
  }
}
