package graft

import java.nio.file.Files

import graft.operators.Similarity
import graft.streaming.AnnIngest
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The incremental-ANN production path end to end: persist the IVF
  * store pair (16-row centroid table + cell-partitioned corpus), then
  * ingest new vectors through the streaming assigner and serve top-k
  * over store ∪ ingested — with the two scale pins that make IVF
  * sublinear: the ingest touches only its own batch directory, and
  * search prunes unprobed cells at the file-source level (dynamic
  * partition pruning off the broadcast probe frame).
  */
class AnnIngestSpec extends SparkSpec {

  private def vecOf(id: Long): Seq[Float] =
    Tables(spark, sf001, "embeddings")
      .filter(col("vec_id") === id).collect()
      .head.getSeq[Float](1)

  test("ingested clones land in their source's cell and are served by search, across a restart") {
    val wh = Files.createTempDirectory("graft_wh_ann").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS annstore LOCATION '$wh'")
    try {
      Similarity.writeIvfStore(spark, sf001, "annstore.cents", "annstore.cells")
      assert(spark.table("annstore.cents").count() === 16)
      val srcCell = spark.table("annstore.cells")
        .filter(col("vec_id") < 2)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      implicit val ctx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val vecs = MemoryStream[(Long, Seq[Float])]
      val cellDir = Files.createTempDirectory("ann_cells").toString
      val ckpt = Files.createTempDirectory("ann_ckpt").toString
      def startQ() = AnnIngest.start(
        vecs.toDF().toDF("vec_id", "embedding"),
        spark.table("annstore.cents"), cellDir, ckpt)

      var q = startQ()
      vecs.addData((1000000L, vecOf(0L)))
      q.processAllAvailable(); q.stop()
      // restart: offsets only in the checkpoint — the next batch must
      // assign through the same persisted centroids
      q = startQ()
      vecs.addData((1000001L, vecOf(1L)))
      q.processAllAvailable(); q.stop()

      val got = AnnIngest.readCells(spark, cellDir)
        .select(col("vec_id"), col("cell"), col("batch_id"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got(1000000L)._1 === srcCell(0L),
        "a clone of vector 0 must be assigned to vector 0's cell")
      assert(got(1000001L)._1 === srcCell(1L),
        "a clone of vector 1 must be assigned to vector 1's cell")
      assert(got(1000000L)._2 !== got(1000001L)._2,
        "the two installments land as distinct batches")

      // search over store ∪ ingested: querying with vector 0 itself
      // must return its ingested clone at cosine 1 (self excluded)
      val queries = Seq((0L, vecOf(0L).map(_.toDouble)))
        .toDF("q_id", "v")
      val res = AnnIngest.search(spark, queries,
        spark.table("annstore.cents"), spark.table("annstore.cells"),
        cellDir, nprobe = 2, k = 1)
        .collect()
      assert(res.length === 1)
      assert(res.head.getLong(1) === 1000000L,
        s"nearest neighbor of vector 0 must be its clone, got ${res.head}")
      assert(res.head.getDouble(2) === 1.0)

      // FOLD: landing zone merges into the base store (pure re-layout
      // — assignments are row-local, nothing changes but file layout);
      // search against the folded table alone still serves the clone
      AnnIngest.fold(spark, "annstore.cells", cellDir, "annstore.cells_v2")
      assert(spark.table("annstore.cells_v2").count() ===
        spark.table("annstore.cells").count() + 2)
      val resFolded = Similarity.annSearch(queries,
        spark.table("annstore.cents"), spark.table("annstore.cells_v2"),
        nprobe = 2, k = 1).collect()
      assert(resFolded.head.getLong(1) === 1000000L &&
        resFolded.head.getDouble(2) === 1.0)
    } finally spark.sql("DROP DATABASE IF EXISTS annstore CASCADE")
  }

  test("search prunes unprobed cells at the file source (dynamic partition pruning)") {
    val wh = Files.createTempDirectory("graft_wh_dpp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS dppstore LOCATION '$wh'")
    try {
      // the SALTED write path (saltBuckets = 2): the salt must spread
      // write tasks without changing row content, the directory
      // layout, or partition pruning — so the whole DPP + search pin
      // below runs against the salted store, and content equality
      // against an unsalted write is asserted first
      Similarity.writeIvfStore(spark, sf001, "dppstore.cents", "dppstore.cells",
        saltBuckets = 2)
      Similarity.writeIvfStore(spark, sf001, "dppstore.cents1",
        "dppstore.cells1")
      assert(spark.table("dppstore.cells")
        .except(spark.table("dppstore.cells1")).isEmpty)
      assert(spark.table("dppstore.cells1")
        .except(spark.table("dppstore.cells")).isEmpty)
      // layout: at most saltBuckets files inside any cell directory
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("dppstore.cells"))
        .location
      val fs = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(loc))
        .filter(_.getPath.getName.startsWith("cell="))
        .foreach { cd =>
          val nf = fs.listStatus(cd.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))
          assert(nf <= 2, s"${cd.getPath.getName}: $nf files > saltBuckets")
        }
      import spark.implicits._
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
      val queries = Seq((0L, vecOf(0L).map(_.toDouble)))
        .toDF("q_id", "v")
      val searched = Similarity.annSearch(queries,
        spark.table("dppstore.cents"), spark.table("dppstore.cells"),
        nprobe = 2, k = 1)
      val scans = searched.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
            if s.output.exists(_.name == "cell") => s
      }
      assert(scans.nonEmpty, "expected the cell-store scan")
      assert(scans.exists(_.partitionFilters.exists(e =>
        e.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))),
        s"cell scan must carry a dynamic partition-pruning filter:\n" +
          searched.queryExecution.executedPlan)
      // and the pruned search still answers (non-empty, self excluded)
      val r = searched.collect()
      assert(r.nonEmpty && r.head.getLong(1) != 0L)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally spark.sql("DROP DATABASE IF EXISTS dppstore CASCADE")
  }
}
