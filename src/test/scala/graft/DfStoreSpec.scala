package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The document-frequency store family (q183): sum-on-read exactness
  * over disjoint installments, the replay contract, the stats-first /
  * terms-last crash-retry convergence, and watermark-carrying
  * compaction.
  */
class DfStoreSpec extends SparkSpec {

  private def sweep(tbls: String*): Unit = tbls.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  private def docs = Tables(spark, sf001, "documents")

  private def directDf(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  test("store after installments reads the full-corpus statistics") {
    sweep("dfs_a", "dfs_a_stats")
    TextOps.writeDfStoreOf(docs.filter(col("doc_id") % 3 =!= 1), "dfs_a", 4)
    val rest = docs.filter(col("doc_id") % 3 === 1)
    assert(TextOps.refreshDfStore(spark,
      rest.filter(col("doc_id") % 2 === 0), "dfs_a", 1L))
    assert(TextOps.refreshDfStore(spark,
      rest.filter(col("doc_id") % 2 =!= 0), "dfs_a", 2L))
    val want = directDf(docs)
    val got = TextOps.readDfStore(spark, "dfs_a")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "sum-on-read df must equal the full-corpus recompute")
    val Array(st) = TextOps.readDfStats(spark, "dfs_a").collect()
    val Array(dw) = docs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)), sum(col("dl"))).collect()
    assert(st.getLong(0) === dw.getLong(0), "n_docs")
    assert(st.getLong(1) === dw.getLong(1), "tot_dl")
  }

  test("replay is a refused no-op; a novel id below the watermark throws") {
    sweep("dfs_b", "dfs_b_stats")
    TextOps.writeDfStoreOf(docs.filter(col("doc_id") % 3 =!= 1), "dfs_b", 4)
    val rest = docs.filter(col("doc_id") % 3 === 1)
    val i1 = rest.filter(col("doc_id") % 2 === 0)
    assert(TextOps.refreshDfStore(spark, i1, "dfs_b", 1L))
    assert(TextOps.refreshDfStore(spark,
      rest.filter(col("doc_id") % 2 =!= 0), "dfs_b", 3L))
    val before = spark.table("dfs_b").count()
    assert(!TextOps.refreshDfStore(spark, i1, "dfs_b", 1L),
      "recorded id must be refused")
    assert(spark.table("dfs_b").count() === before,
      "the refusal must be a no-op")
    val e = intercept[IllegalArgumentException] {
      TextOps.refreshDfStore(spark, i1, "dfs_b", 2L)
    }
    assert(e.getMessage.contains("watermark"),
      "novel id below the watermark is a checkpoint reset, not a replay")
  }

  test("a crash between the stats and term appends converges under retry") {
    sweep("dfs_c", "dfs_c_stats")
    TextOps.writeDfStoreOf(docs.filter(col("doc_id") % 3 =!= 1), "dfs_c", 4)
    val inst = docs.filter(col("doc_id") % 3 === 1)
    // simulated crash: the stats row landed, the term append did not
    TextOps.landDfStats(spark, inst, "dfs_c", 1L)
    assert(spark.table("dfs_c_stats")
      .filter(col("batch_id") === 1L).count() === 1)
    // retry: the guard still sees batch 1 as novel (terms are the
    // commit point), the stats append is skipped, the terms land
    assert(TextOps.refreshDfStore(spark, inst, "dfs_c", 1L),
      "retry of a crashed fold must complete it, not refuse it")
    assert(spark.table("dfs_c_stats")
      .filter(col("batch_id") === 1L).count() === 1,
      "the retry must not double-land the stats row")
    val want = directDf(docs)
    val got = TextOps.readDfStore(spark, "dfs_c")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "after retry the store equals the full-corpus recompute")
  }

  test("compaction collapses installments, preserves reads, carries the watermark") {
    sweep("dfs_d", "dfs_d_stats", "dfs_dc", "dfs_dc_stats")
    TextOps.writeDfStoreOf(docs.filter(col("doc_id") % 3 =!= 1), "dfs_d", 4)
    val rest = docs.filter(col("doc_id") % 3 === 1)
    val i1 = rest.filter(col("doc_id") % 2 === 0)
    assert(TextOps.refreshDfStore(spark, i1, "dfs_d", 1L))
    assert(TextOps.refreshDfStore(spark,
      rest.filter(col("doc_id") % 2 =!= 0), "dfs_d", 2L))
    TextOps.compactDfStore(spark, "dfs_d", "dfs_dc")
    val a = TextOps.readDfStore(spark, "dfs_d")
    val b = TextOps.readDfStore(spark, "dfs_dc")
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "df reads equal")
    assert(TextOps.readDfStats(spark, "dfs_d").collect().toSeq ===
      TextOps.readDfStats(spark, "dfs_dc").collect().toSeq, "stats equal")
    assert(spark.table("dfs_dc")
      .agg(max(col("batch_id"))).collect()(0).getLong(0) === 2L,
      "compaction carries the replay watermark")
    // the gram/vocab stores' conservative post-compaction contract:
    // the watermark id itself is recorded (replay refused, false);
    // an OLDER pre-compaction id lands in the loud-fail branch
    assert(!TextOps.refreshDfStore(spark, rest, "dfs_dc", 2L),
      "replaying the latest batch after compaction is still refused")
    intercept[IllegalArgumentException] {
      TextOps.refreshDfStore(spark, i1, "dfs_dc", 1L)
    }
  }
}
