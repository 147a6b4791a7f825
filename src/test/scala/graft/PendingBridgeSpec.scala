package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** [[Dedup.pendingBridges]] on planted fixtures, plus the
  * conservation law that ties the report to the refresh: every
  * reported (keep, stale) pair is merged by refreshedComponents, and
  * re-running the report against the refreshed stores drains it to
  * zero rows — so "pendingBridges is empty" is exactly the invariant
  * "every store label is closure-exact right now".
  *
  * The planted store mimics how bridges arise in production: two
  * stored docs with identical text (they collide in every band) that
  * the component store nevertheless keeps in separate clusters,
  * because it was built by clustering two sources independently and
  * unioning the results.
  */
class PendingBridgeSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def fixture(): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val tA = (0 until 40).map(i => s"pb$i").mkString(" ")
    val tB = (0 until 40).map(i => s"qq$i").mkString(" ")
    val storeDocs = Seq((10L, tA), (20L, tA), (40L, tB), (41L, tB))
      .toDF("doc_id", "text")
    val bands = Dedup.bandSignatures(storeDocs)
      .select(col("doc_id"), col("band"), col("h1"), col("h2"))
      .localCheckpoint(true)
    // per-source prior clustering: 10 and 20 are the same family but
    // sit in separate clusters; 40/41 are properly one cluster
    val comps = Seq((10L, 10L), (20L, 20L), (40L, 40L), (41L, 40L))
      .toDF("doc_id", "comp")
    (storeDocs, bands, comps)
  }

  test("a batch doc matching two store clusters reports one stale row") {
    import spark.implicits._
    val (_, bands, comps) = fixture()
    val tA = (0 until 40).map(i => s"pb$i").mkString(" ")
    val batch = Seq((30L, tA)).toDF("doc_id", "text")
    val rows = Dedup.pendingBridges(spark, batch, bands, comps).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("batch_comp") === 30L)
    assert(r.getAs[Long]("store_comp_keep") === 10L)
    assert(r.getAs[Long]("store_comp_stale") === 20L)
    assert(r.getAs[Long]("n_batch_docs") === 1L)
  }

  test("bridging twins count as one component; non-bridging matches report nothing") {
    import spark.implicits._
    val (_, bands, comps) = fixture()
    val tA = (0 until 40).map(i => s"pb$i").mkString(" ")
    val tB = (0 until 40).map(i => s"qq$i").mkString(" ")
    // twins 30/31 bridge the split family; 32 matches the healthy
    // cluster (single root -> no row); 33 is novel (no match)
    val batch = Seq((30L, tA), (31L, tA), (32L, tB),
      (33L, (0 until 40).map(i => s"nv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Dedup.pendingBridges(spark, batch, bands, comps).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("batch_comp") === 30L, "twins close to min member id")
    assert(r.getAs[Long]("store_comp_keep") === 10L)
    assert(r.getAs[Long]("store_comp_stale") === 20L)
    assert(r.getAs[Long]("n_batch_docs") === 2L)
  }

  test("conservation: reported bridges are merged by the refresh, then the report drains") {
    import spark.implicits._
    val (_, bands, comps) = fixture()
    val tA = (0 until 40).map(i => s"pb$i").mkString(" ")
    val batch = Seq((30L, tA)).toDF("doc_id", "text")
    val reported = Dedup.pendingBridges(spark, batch, bands, comps).collect()
    assert(reported.nonEmpty)

    val nb = Dedup.bandSignatures(batch).localCheckpoint(true)
    val (bl, sn) = Dedup.refreshDelta(nb, batch.select(col("doc_id")),
      bands, comps)
    val refreshed = Dedup.refreshedComponents(comps, bl, sn)
      .localCheckpoint(true)
    val lbl = refreshed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every reported (keep, stale) pair is united by the refresh
    reported.foreach { r =>
      val keep = r.getAs[Long]("store_comp_keep")
      val stale = r.getAs[Long]("store_comp_stale")
      assert(lbl(keep) === lbl(stale),
        s"refresh must merge reported bridge ($keep, $stale)")
    }
    // and the drained report: the same batch against the refreshed
    // stores finds every matched root in one cluster
    val newBands = bands.union(
      nb.select(col("doc_id"), col("band"), col("h1"), col("h2")))
    val after = Dedup.pendingBridges(spark, batch, newBands, refreshed)
    assert(after.isEmpty, "pendingBridges must drain after the refresh")
  }
}
