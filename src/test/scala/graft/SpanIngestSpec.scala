package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The incremental span-coverage loop (q164 → q166 → SpanIngest):
  * a persisted (gid)-bucketed gram-frequency store, the delta-sized
  * batch scorer `Dedup.spanCoverageAgainstStore`, and its streaming
  * deployment. Pins the three production claims:
  *
  *  1. scoring a batch against the PERSISTED store table equals the
  *     full-corpus q164 recompute restricted to the batch docs
  *     (q166 proves the inline-store variant under the driver hash
  *     gate; this covers the writeGramStore read path);
  *  2. the store side of the gid join never shuffles (bucketed scan
  *     co-partitioning — the BucketedStoreSpec property composed with
  *     this operator);
  *  3. the stream is offset-only state: restarts resume against the
  *     same store, within-batch duplicates mark each other, novel
  *     text scores 0.
  */
class SpanIngestSpec extends SparkSpec {

  test("batch scored against the persisted gram store equals the full recompute") {
    val wh = Files.createTempDirectory("graft_wh_gram").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS gramstore LOCATION '$wh'")
    try {
      val docs = Tables(spark, sf001, "documents")
      // persist the store subset's gram frequencies (doc_id % 7 != 3),
      // mirroring q166's split, then score the % 7 == 3 batch
      val storeDocs = docs.filter(col("doc_id") % 7 =!= 3)
      val batch = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), col("text"))
      // writeGramStore reads a dir's documents table; build the store
      // from the subset through the same frame + bucketed layout
      Dedup.gramFrequencies(storeDocs)
        .repartition(8, col("gid"))
        .write.bucketBy(8, "gid").sortBy("gid")
        .format("parquet").mode("overwrite")
        .saveAsTable("gramstore.grams_b")

      val got = Dedup.spanCoverageAgainstStore(
        batch, spark.table("gramstore.grams_b"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val full = SparkEntry.queries("q164_dup_span_coverage")(spark, sf001)
        .filter(col("doc_id") % 7 === 3)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got === full,
        "incremental coverage through the persisted store must equal " +
          "the full-corpus recompute on the batch docs")
      assert(got.values.exists(_._2 > 0),
        "fixture must contain duplicated spans in the batch slice")
    } finally spark.sql("DROP DATABASE IF EXISTS gramstore CASCADE")
  }

  test("the gid join reads the gram store with no store-side exchange") {
    val wh = Files.createTempDirectory("graft_wh_gram2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS gramstore2 LOCATION '$wh'")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      Dedup.writeGramStore(spark, sf001, "gramstore2.grams_b", buckets = 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val batch = Tables(spark, sf001, "documents")
        .filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), col("text"))
      val cov = Dedup.spanCoverageAgainstStore(
        batch, spark.table("gramstore2.grams_b"))
      val plan = cov.queryExecution.executedPlan
      // several gid joins exist (batch-side bdf/dupG are free to
      // shuffle); the pin is on the STORE's path: no exchange may sit
      // anywhere between the bucketed grams_b scan and its join
      def isStoreScan(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("grams_b"))
        case _ => false
      }
      assert(plan.collect { case p if isStoreScan(p) => p }.nonEmpty,
        s"expected a grams_b scan in the plan:\n$plan")
      // downstream of the FIRST gid join the frames are batch-sized
      // and free to shuffle (the doc_id window must); the pin is that
      // the join side FEEDING from the store scan carries no exchange
      // between scan and join — the bucketed layout is the partitioning
      val storeJoinSides = plan.collect { case j: SortMergeJoinExec => j }
        .flatMap(j => Seq(j.left, j.right))
        .filter(side => side.collect { case p if isStoreScan(p) => p }.nonEmpty)
      assert(storeJoinSides.nonEmpty, s"expected an SMJ fed by grams_b:\n$plan")
      val direct = storeJoinSides.minBy(_.collect { case p => p }.size)
      assert(direct.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed gram store must reach its first join with no exchange:\n$plan")
      assert(cov.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP DATABASE IF EXISTS gramstore2 CASCADE")
    }
  }

  test("refresh append + sum-on-read equals a one-shot store; compaction preserves it") {
    val wh = Files.createTempDirectory("graft_wh_gram3").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS gramstore3 LOCATION '$wh'")
    try {
      val docs = Tables(spark, sf001, "documents")
      // store from the subset, then fold the ingest installment in
      Dedup.gramFrequencies(docs.filter(col("doc_id") % 7 =!= 3))
        .withColumn("batch_id", lit(0L))
        .repartition(8, col("gid"))
        .write.bucketBy(8, "gid").sortBy("gid")
        .format("parquet").mode("overwrite")
        .saveAsTable("gramstore3.grams_b")
      val installment =
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id"), col("text"))
      assert(Dedup.refreshGramStore(spark, installment,
        "gramstore3.grams_b", batchId = 1L),
        "a fresh installment must fold in")

      val oneShot = Dedup.gramFrequencies(docs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val summed = Dedup.readGramStore(spark, "gramstore3.grams_b")
      assert(asMap(summed) === oneShot,
        "sum-on-read after a refresh append must equal the one-shot store")

      // REPLAY GUARD: re-delivering the same installment is a no-op —
      // the store is idempotent per batch, not silently double-counted
      assert(!Dedup.refreshGramStore(spark, installment,
        "gramstore3.grams_b", batchId = 1L),
        "a replayed installment must be refused by the watermark")
      assert(asMap(Dedup.readGramStore(spark, "gramstore3.grams_b"))
        === oneShot, "a replayed installment must not change the store")
      // the sum-on-read aggregate is bucket-local: no exchange
      val aggPlan = summed.queryExecution.executedPlan
      assert(aggPlan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"gram-store sum-on-read must not shuffle:\n$aggPlan")

      Dedup.compactGramStore(spark, "gramstore3.grams_b", "gramstore3.grams_c")
      assert(asMap(Dedup.readGramStore(spark, "gramstore3.grams_c")) === oneShot,
        "compaction must preserve the summed frequencies")
      // the watermark survives compaction: the replayed batch is still
      // refused against the compacted table
      assert(!Dedup.refreshGramStore(spark, installment,
        "gramstore3.grams_c", batchId = 1L),
        "compaction must carry the replay watermark forward")
      // one file per non-empty bucket after compaction
      val files = spark.table("gramstore3.grams_c").inputFiles
      assert(files.length <= 8, s"expected <= 8 files, got ${files.length}")
      // compaction refuses to overwrite the table being read
      intercept[IllegalArgumentException] {
        Dedup.compactGramStore(spark, "gramstore3.grams_c", "gramstore3.GRAMS_C")
      }

      // NON-MONOTONE NOVEL id ≠ replay: fold batch 3, then offer
      // batch 2 — below the watermark but never recorded (the
      // checkpoint-reset shape). Silently returning false would
      // under-count the store, so the guard throws instead.
      assert(Dedup.refreshGramStore(spark, installment.limit(1),
        "gramstore3.grams_b", batchId = 3L))
      intercept[IllegalArgumentException] {
        Dedup.refreshGramStore(spark, installment,
          "gramstore3.grams_b", batchId = 2L)
      }
      // ...while replaying the recorded batch 3 is still a quiet no-op
      assert(!Dedup.refreshGramStore(spark, installment.limit(1),
        "gramstore3.grams_b", batchId = 3L))
    } finally spark.sql("DROP DATABASE IF EXISTS gramstore3 CASCADE")
  }

  test("streaming SpanIngest scores across restarts with offset-only state") {
    val wh = Files.createTempDirectory("graft_wh_si").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS sistore LOCATION '$wh'")
    try {
      Dedup.writeGramStore(spark, sf001, "sistore.grams_b", buckets = 8)
      val srcText = Tables(spark, sf001, "documents")
        .filter(col("doc_id") === 0).collect().head.getString(1)
      val novel = (0 until 40).map(i => s"nv$i").mkString(" ")
      val novel2 = (0 until 40).map(i => s"tw$i").mkString(" ")

      implicit val ctx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val docs = MemoryStream[(Long, String)]
      val outDir = Files.createTempDirectory("si_out").toString
      val ckpt = Files.createTempDirectory("ckpt_si").toString
      def startQ() = graft.streaming.SpanIngest.start(
        docs.toDF().toDF("doc_id", "text"),
        spark.table("sistore.grams_b"), outDir, ckpt)

      // batch 0: a clone of stored doc 0 (every 8-gram hits the
      // store → full coverage) + novel text (no marks → zero)
      var q = startQ()
      docs.addData((1000000L, srcText), (1000001L, novel))
      q.processAllAvailable(); q.stop()
      // restart on offsets only; batch 1: within-batch twins — the
      // store has never seen them, but batch_df = 2 marks everything
      q = startQ()
      docs.addData((1000002L, novel2), (1000003L, novel2))
      q.processAllAvailable(); q.stop()

      val got = graft.streaming.SpanIngest.readCoverage(spark, outDir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
      assert(got(1000000L) === ((1.0, 0L)), s"stored clone fully covered: $got")
      assert(got(1000001L) === ((0.0, 0L)), s"novel text uncovered: $got")
      assert(got(1000002L) === ((1.0, 1L)), s"within-batch twin covered: $got")
      assert(got(1000003L) === ((1.0, 1L)), s"within-batch twin covered: $got")
      assert(got.size === 4)
    } finally spark.sql("DROP DATABASE IF EXISTS sistore CASCADE")
  }

  test("streaming strip lands cleaned text with provable fingerprints") {
    val wh = Files.createTempDirectory("graft_wh_ss").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ssstore LOCATION '$wh'")
    try {
      import spark.implicits._
      graft.functions.Md5Long.register(spark)
      Dedup.writeGramStore(spark, sf001, "ssstore.grams_b", buckets = 8)
      val srcText = Tables(spark, sf001, "documents")
        .filter(col("doc_id") === 0L).select(col("text")).head().getString(0)
      val novel = "uq uq words never in corpus at all a b c d e f g h i"
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val ctx = spark.sqlContext
      val docs = MemoryStream[(Long, String)]
      val outDir = Files.createTempDirectory("ss_out").toString
      val ckpt = Files.createTempDirectory("ss_ckpt").toString
      val q = graft.streaming.SpanIngest.startWithStrip(
        docs.toDF().toDF("doc_id", "text"),
        spark.table("ssstore.grams_b"), outDir, ckpt)
      docs.addData((3000000L, srcText), (3000001L, novel))
      q.processAllAvailable(); q.stop()

      val landed = graft.streaming.SpanIngest.readStripped(spark, outDir)
      val rows = landed.collect()
        .map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4),
          r.getString(5)))).toMap
      // the stored clone is 100% boilerplate: everything stripped
      assert(rows(3000000L)._1 === 1.0 && rows(3000000L)._2 === 0L
        && rows(3000000L)._3 === "", s"clone must strip to empty: $rows")
      // the novel doc passes through verbatim
      assert(rows(3000001L)._1 === 0.0 && rows(3000001L)._3 === novel,
        s"novel text must pass through: $rows")
      // per-batch rewrite provability: every landed fingerprint
      // matches a recompute over the landed clean text
      assert(landed
        .filter(expr("md5long(clean_text)") =!= col("clean_fp"))
        .count() === 0L, "landed fingerprints must prove the rewrite")

      // threshold semantics: minCoverage above any real coverage
      // disables the strip — the clone rides through untouched
      val outDir2 = Files.createTempDirectory("ss_out2").toString
      val ckpt2 = Files.createTempDirectory("ss_ckpt2").toString
      val docs2 = MemoryStream[(Long, String)]
      val q2 = graft.streaming.SpanIngest.startWithStrip(
        docs2.toDF().toDF("doc_id", "text"),
        spark.table("ssstore.grams_b"), outDir2, ckpt2, minCoverage = 1.1)
      docs2.addData((3000002L, srcText))
      q2.processAllAvailable(); q2.stop()
      val kept = graft.streaming.SpanIngest.readStripped(spark, outDir2)
        .collect().map(r => (r.getDouble(3), r.getString(5))).head
      assert(kept === ((1.0, srcText)),
        "below-threshold docs must keep their text (coverage still scored)")
    } finally spark.sql("DROP DATABASE IF EXISTS ssstore CASCADE")
  }
}
