package graft

import java.nio.file.Files

import graft.stores.DeltaStore
import org.apache.spark.sql.functions._

/** The shared delta-store core, tested ONCE (round-12 verdict item):
  * the four families (gram/vocab/df/keyframe) delegate their
  * write/refresh/read/compact to [[DeltaStore]], so the replay,
  * crash-convergence, and compaction contract is pinned here against
  * a toy store instead of four hand-rolled copies. Family specs keep
  * their DOMAIN pins (sum-on-read == recount, store == recompute);
  * this spec owns the mechanism.
  */
class DeltaStoreSpec extends SparkSpec {

  private def toy(n: Long, off: Long = 0L) = {
    import spark.implicits._
    (0L until n).map(i => (i + off, 1L)).toDF("k", "v")
  }

  test("replay guard: replay refused, non-monotone novel id throws, monotone folds") {
    val wh = Files.createTempDirectory("graft_wh_ds").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsc LOCATION '$wh'")
    val t = "dsc.toy"
    try {
      DeltaStore.write(spark, toy(10), t, Seq("k"), buckets = 4)
      assert(DeltaStore.refresh(spark, toy(5, 100), t, Seq("k"), 1L))
      assert(!DeltaStore.refresh(spark, toy(5, 100), t, Seq("k"), 1L),
        "an exact replay must be a refused no-op")
      // the refused replay must not have derived OR appended anything
      assert(spark.table(t).count() === 15)
      assert(DeltaStore.refresh(spark, toy(5, 200), t, Seq("k"), 3L),
        "ids may skip (epochs), monotone is the only requirement")
      val e = intercept[IllegalArgumentException] {
        DeltaStore.refresh(spark, toy(5, 300), t, Seq("k"), 2L)
      }
      assert(e.getMessage.contains("non-monotone"),
        "a NOVEL id below the watermark is a checkpoint reset — throw")
      // sum-on-read: base ∪ installments, overlapping keys sum
      assert(DeltaStore.refresh(spark, toy(10), t, Seq("k"), 4L))
      val summed = DeltaStore.readSum(spark, t, Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(summed(0L) === 2L && summed(100L) === 1L)
      assert(summed.size === 20)
    } finally spark.sql("DROP DATABASE IF EXISTS dsc CASCADE")
  }

  test("refresh is lazy on replay and runs beforeCommit only when admitted") {
    val wh = Files.createTempDirectory("graft_wh_ds2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsl LOCATION '$wh'")
    val t = "dsl.toy"
    try {
      DeltaStore.write(spark, toy(3), t, Seq("k"), buckets = 2)
      var derived = 0; var hooked = 0
      def delta = { derived += 1; toy(2, 50) }
      assert(DeltaStore.refresh(spark, delta, t, Seq("k"), 1L,
        beforeCommit = () => hooked += 1))
      assert(derived === 1 && hooked === 1)
      assert(!DeltaStore.refresh(spark, delta, t, Seq("k"), 1L,
        beforeCommit = () => hooked += 1))
      assert(derived === 1,
        "a refused replay must never derive the batch frame")
      assert(hooked === 1,
        "a refused replay must never run the sidecar hook")
    } finally spark.sql("DROP DATABASE IF EXISTS dsl CASCADE")
  }

  test("compact rolls forward, keeps the watermark, refuses in-place; extra hook runs") {
    val wh = Files.createTempDirectory("graft_wh_ds3").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsk LOCATION '$wh'")
    val t = "dsk.toy"; val t2 = "dsk.toy_c"
    try {
      DeltaStore.write(spark, toy(6), t, Seq("k"), buckets = 2)
      assert(DeltaStore.refresh(spark, toy(6), t, Seq("k"), 1L))
      assert(DeltaStore.refresh(spark, toy(3), t, Seq("k"), 2L))
      intercept[IllegalArgumentException] {
        DeltaStore.compact(spark, t, t, // in-place is undefined mid-read
          DeltaStore.readSum(spark, t, Seq("k"), Seq("v")), Seq("k"))
      }
      var extraWm = -1L
      DeltaStore.compact(spark, t, t2,
        DeltaStore.readSum(spark, t, Seq("k"), Seq("v")), Seq("k"),
        extra = wm => extraWm = wm.head().getLong(0))
      assert(extraWm === 2L, "the extra hook sees the carried watermark")
      // one row per key, values summed, watermark on every row
      val rows = spark.table(t2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.length === 6)
      assert(rows.filter(_._1 < 3).forall(_._2 === 3L))
      assert(rows.forall(_._3 === 2L),
        "compaction must carry max(batch_id) onto every row")
      // a pre-compaction batch replayed after compaction: the id set
      // collapsed to the watermark, so the replay lands in the
      // loud-fail branch — conservative, an operator decision
      intercept[IllegalArgumentException] {
        DeltaStore.refresh(spark, toy(1), t2, Seq("k"), 1L)
      }
      // post-compaction appends continue above the watermark
      assert(DeltaStore.refresh(spark, toy(2), t2, Seq("k"), 3L))
      assert(DeltaStore.readSum(spark, t2, Seq("k"), Seq("v"))
        .filter(col("k") === 0L).head().getLong(1) === 4L)
      // compacted stores stay bucketed: the roll-forward target takes
      // further installments and compacts again
      DeltaStore.compact(spark, t2, "dsk.toy_c2",
        DeltaStore.readSum(spark, t2, Seq("k"), Seq("v")), Seq("k"))
      assert(spark.table("dsk.toy_c2").agg(max(col("batch_id")))
        .head().getLong(0) === 3L)
    } finally spark.sql("DROP DATABASE IF EXISTS dsk CASCADE")
  }

  test("empty delta: installment recorded, replay refused, watermark survives compaction") {
    val wh = Files.createTempDirectory("graft_wh_ds5").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dse LOCATION '$wh'")
    val t = "dse.toy"; val t2 = "dse.toy_c"
    try {
      import spark.implicits._
      val empty = Seq.empty[(Long, Long)].toDF("k", "v")
      DeltaStore.write(spark, toy(4), t, Seq("k"), buckets = 2)
      // installment 1 appends ZERO rows — before the watermark
      // sidecar its batch_id never entered the recorded set and the
      // generic contract ("a recorded id is a genuine replay →
      // refused") silently did not hold (round-13 advice fix; the wet
      // family's hand-rolled sentinel is retired by this)
      assert(DeltaStore.refresh(spark, empty, t, Seq("k"), 1L),
        "an empty delta is still an admitted installment")
      assert(spark.table(t).count() === 4, "no key rows appended")
      assert(!DeltaStore.refresh(spark, toy(2, 100), t, Seq("k"), 1L),
        "replaying the empty installment must be refused — its rows " +
          "(here: different, crash-replay divergence) must never fold")
      // monotone novel ids continue above the empty installment
      assert(DeltaStore.refresh(spark, toy(2, 100), t, Seq("k"), 2L))
      intercept[IllegalArgumentException] {
        DeltaStore.refresh(spark, toy(1), t, Seq("k"), 0L)
      }
      // an empty FINAL installment's watermark survives compaction
      assert(DeltaStore.refresh(spark, empty, t, Seq("k"), 7L))
      DeltaStore.compact(spark, t, t2,
        DeltaStore.readSum(spark, t, Seq("k"), Seq("v")), Seq("k"))
      assert(!DeltaStore.refresh(spark, toy(1, 300), t2, Seq("k"), 7L),
        "the sidecar-only watermark must ride the roll-forward")
      assert(DeltaStore.refresh(spark, toy(1, 300), t2, Seq("k"), 8L))
    } finally spark.sql("DROP DATABASE IF EXISTS dse CASCADE")
  }

  test("multi-column keys bucket and compact on the full key (keyframe shape)") {
    val wh = Files.createTempDirectory("graft_wh_ds4").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsm LOCATION '$wh'")
    import spark.implicits._
    val t = "dsm.sig"
    try {
      val rows = Seq((1L, 2L, 10L), (3L, 4L, 11L)).toDF("a", "b", "x")
      DeltaStore.write(spark, rows, t, Seq("a", "b"), buckets = 2)
      assert(DeltaStore.refresh(spark,
        Seq((5L, 6L, 12L)).toDF("a", "b", "x"), t, Seq("a", "b"), 1L))
      // set semantics: the view is a projection, disjointness comes
      // from the guard — compact keeps all rows, once each
      DeltaStore.compact(spark, t, "dsm.sig_c",
        spark.table(t).select(col("a"), col("b"), col("x")), Seq("a", "b"))
      assert(spark.table("dsm.sig_c").count() === 3)
      val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("dsm.sig_c"))
        .bucketSpec
      assert(spec.exists(_.bucketColumnNames === Seq("a", "b")),
        "the roll-forward target must bucket on the full key")
    } finally spark.sql("DROP DATABASE IF EXISTS dsm CASCADE")
  }

  test("recordedIdsMulti: a four-store family's guards read in ONE job, slices drive refresh exactly like per-store reads") {
    val wh = Files.createTempDirectory("graft_wh_dsg").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsg LOCATION '$wh'")
    try {
      // four stores with DIFFERENT installment sets, incl. an
      // empty-delta installment recorded only by its sidecar (the
      // saturated-batch case the guard exists for)
      val ts = (1 to 4).map(i => s"dsg.fam$i")
      ts.foreach(t => DeltaStore.write(spark, toy(3), t, Seq("k"), 2))
      assert(DeltaStore.refresh(spark, toy(2, 10), ts(0), Seq("k"), 1L))
      assert(DeltaStore.refresh(spark, toy(2, 10), ts(0), Seq("k"), 2L))
      assert(DeltaStore.refresh(spark, toy(2, 10), ts(1), Seq("k"), 1L))
      assert(DeltaStore.refresh(spark, toy(0), ts(2), Seq("k"), 5L),
        "empty delta records via the sidecar only")
      // ts(3): base build only
      val sc = spark.sparkContext
      sc.setJobGroup("guard-multi", "fused guard read")
      val guards = DeltaStore.recordedIdsMulti(spark, ts)
      sc.clearJobGroup()
      val jobs = sc.statusTracker.getJobIdsForGroup("guard-multi")
      assert(jobs.length === 1,
        s"the family guard read must be ONE job, saw ${jobs.length}")
      assert(guards(ts(0)).sorted.toSeq === Seq(0L, 1L, 2L))
      assert(guards(ts(1)).sorted.toSeq === Seq(0L, 1L))
      assert(guards(ts(2)).sorted.toSeq === Seq(0L, 5L),
        "the sidecar-only installment must appear in the fused read")
      assert(guards(ts(3)).sorted.toSeq === Seq(0L))
      // the slices drive refresh exactly like the per-store read:
      // replay refused, monotone novel admitted, stale-slice
      // non-monotone novel still thrown
      assert(!DeltaStore.refresh(spark, toy(2, 20), ts(0), Seq("k"), 2L,
        recorded = Some(guards(ts(0)))), "replayed id in slice → refused")
      assert(DeltaStore.refresh(spark, toy(2, 20), ts(1), Seq("k"), 7L,
        recorded = Some(guards(ts(1)))), "monotone novel id → folds")
      val e = intercept[IllegalArgumentException] {
        DeltaStore.refresh(spark, toy(2, 30), ts(2), Seq("k"), 3L,
          recorded = Some(guards(ts(2))))
      }
      assert(e.getMessage.contains("non-monotone"))
    } finally spark.sql("DROP DATABASE IF EXISTS dsg CASCADE")
  }

  test("legacy sidecar TABLE migrates to markers; empty-installment replay refuses convergently on an upgraded store") {
    val wh = Files.createTempDirectory("graft_wh_dsv").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsv LOCATION '$wh'")
    import spark.implicits._
    def sidecarPath(tbl: String) = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier(tbl + "_wm")))
    def markers(tbl: String): Set[Long] = {
      val p = sidecarPath(tbl)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Set.empty[Long]
      else fs.listStatus(p).flatMap(st =>
        scala.util.Try(st.getPath.getName.toLong).toOption).toSet
    }
    // rewind a store's sidecar to the pre-round-16 shape: the marker
    // directory replaced by a managed parquet TABLE (one batch_id row
    // per installment) at the SAME warehouse path — the legacy
    // writer's exact fixture
    def rewindToLegacy(tbl: String, ids: Seq[Long]): Unit = {
      val p = sidecarPath(tbl)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      ids.toDF("batch_id").write.format("parquet")
        .saveAsTable(tbl + "_wm")
    }
    try {
      val t = "dsv.toy"
      DeltaStore.write(spark, toy(4), t, Seq("k"), 2)
      assert(DeltaStore.refresh(spark,
        Seq.empty[(Long, Long)].toDF("k", "v"), t, Seq("k"), 1L),
        "empty installment recorded (sidecar-only id)")
      rewindToLegacy(t, Seq(0L, 1L))
      // the upgrade hazard: id 1 exists ONLY in the legacy table (no
      // key rows). The guard's first read must migrate it, so the
      // replay refuses with the designed convergent `false` — before
      // the shim it was re-admitted and then threw non-monotone
      assert(!DeltaStore.refresh(spark, toy(2, 100), t, Seq("k"), 1L),
        "empty-installment replay on an upgraded store must refuse " +
          "convergently, not throw")
      assert(!spark.catalog.tableExists(t + "_wm"),
        "migration retires the legacy catalog entry")
      assert(markers(t) === Set(0L, 1L),
        "every legacy id must survive as a marker file")
      assert(DeltaStore.refresh(spark, toy(2, 100), t, Seq("k"), 2L))
      assert(markers(t) === Set(0L, 1L, 2L))
      // recordWm's own migrate branch: with the guard pre-read
      // supplied the fold never calls wmIds — the marker write is the
      // first legacy touch and must migrate before dropping the table
      val t2 = "dsv.toy2"
      DeltaStore.write(spark, toy(3), t2, Seq("k"), 2)
      rewindToLegacy(t2, Seq(0L))
      assert(DeltaStore.refresh(spark, toy(2, 50), t2, Seq("k"), 1L,
        recorded = Some(Array(0L))))
      assert(!spark.catalog.tableExists(t2 + "_wm"))
      assert(markers(t2) === Set(0L, 1L))
      // a roll (overwrite) deliberately retires legacy ids with the set
      rewindToLegacy(t2, Seq(0L, 1L))
      DeltaStore.write(spark, toy(3), t2, Seq("k"), 2)
      assert(markers(t2) === Set(0L),
        "a base rebuild resets the watermark set, legacy included")
    } finally spark.sql("DROP DATABASE IF EXISTS dsv CASCADE")
  }

  test("job budget per refresh: sidecar recording costs ZERO jobs (round-16 marker dir)") {
    val wh = Files.createTempDirectory("graft_wh_dsj").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dsj LOCATION '$wh'")
    try {
      val t = "dsj.kv"
      DeltaStore.write(spark, toy(3), t, Seq("k"), 2)
      val sc = spark.sparkContext
      def jobsOf(group: String)(body: => Unit): Int = {
        sc.setJobGroup(group, group)
        body
        sc.clearJobGroup()
        sc.statusTracker.getJobIdsForGroup(group).length
      }
      // guard pre-read supplied (the fold-family path): the whole
      // fold is the key-table append — one job; the watermark marker
      // is a filesystem create, not a job. The pre-marker-dir sidecar
      // made this 2 (append + 1-row parquet write), every fold, on
      // every ingest pipeline.
      val guards = DeltaStore.recordedIdsMulti(spark, Seq(t))
      // (the append itself is two jobs under AQE — the repartition's
      // shuffle stage materializes separately from the write)
      val jFold = jobsOf("fold-only") {
        assert(DeltaStore.refresh(spark, toy(2, 10), t, Seq("k"), 1L,
          recorded = Some(guards(t))))
      }
      assert(jFold <= 2, s"recorded-supplied refresh is the append alone " +
        s"(2 jobs under AQE), saw $jFold")
      // self-guarded refresh: one fused guard read + the append
      val jFull = jobsOf("fold-guarded") {
        assert(DeltaStore.refresh(spark, toy(2, 20), t, Seq("k"), 2L))
      }
      assert(jFull <= 3, s"self-guarded refresh is guard (1 job) + append, " +
        s"saw $jFull")
      // and a replay consumes only the guard read — no append job
      val jReplay = jobsOf("fold-replay") {
        assert(!DeltaStore.refresh(spark, toy(2, 30), t, Seq("k"), 2L))
      }
      assert(jReplay <= 1, s"a refused replay is the guard read alone, " +
        s"saw $jReplay")
    } finally spark.sql("DROP DATABASE IF EXISTS dsj CASCADE")
  }
}
