package graft

import scala.util.Random

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) property for the incremental
  * refresh: building the WHOLE corpus by folding K sequential ingest
  * batches into initially-empty stores — refreshDelta +
  * refreshedComponents per batch, band store accumulated by union —
  * must end with labels equal to the brute-force union-find closure
  * of the full corpus' LSH pair graph (singletons labeling
  * themselves). This is the property that makes the refresh
  * trustworthy: no ordering of ingestion, no placement of clones,
  * twins, or bridge docs across batch boundaries may lose or invent
  * a merge.
  *
  * Corpus shapes per trial: template families (exact clones + light
  * token-substitution variants) scattered over shuffled doc ids and
  * random batches — so cluster minima, bridge paths, and family
  * members routinely straddle batches — plus disjoint-vocabulary
  * singletons. Ground truth comes from the SAME pair generator the
  * engine uses (pairsFromBands), so the property tests the refresh
  * algebra, not the LSH recall.
  */
class RefreshPropertySpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  test("K sequential refreshes from empty stores equal the full closure") {
    import spark.implicits._
    val rnd = new Random(90210)
    for (trial <- 0 until 4) {
      // --- generate the corpus -------------------------------------------
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      val nFam = 3 + rnd.nextInt(4)
      for (f <- 0 until nFam) {
        val base = (0 until 40).map(i => s"t${trial}f${f}w$i")
        val members = 2 + rnd.nextInt(5)
        for (m <- 0 until members) {
          val t =
            if (m == 0 || rnd.nextBoolean()) base // exact clone
            else base.map(w => // light variant
              if (rnd.nextInt(10) == 0) s"t${trial}f${f}v${rnd.nextInt(5)}"
              else w)
          texts += t.mkString(" ")
        }
      }
      for (sg <- 0 until 3 + rnd.nextInt(6))
        texts += (0 until 12).map(i => s"t${trial}s${sg}x$i").mkString(" ")
      // scatter ids so family minima land in random batches
      val ids = rnd.shuffle((0 until texts.size).map(_.toLong * 7 + 13).toList)
      val docs = ids.zip(texts)

      // --- K sequential refreshes from empty stores ----------------------
      var bands = Seq.empty[(Long, Int, Long, Long)]
        .toDF("doc_id", "band", "h1", "h2")
      var comps = Seq.empty[(Long, Long)].toDF("doc_id", "comp")
      val k = 3
      val batches = docs.groupBy(_ => rnd.nextInt(k)).toSeq.sortBy(_._1)
      for ((_, batch) <- batches) {
        val bdf = batch.toDF("doc_id", "text")
        val nb = Dedup.bandSignatures(bdf).localCheckpoint(true)
        val (bl, sn) = Dedup.refreshDelta(nb, bdf.select(col("doc_id")),
          bands, comps)
        comps = Dedup.refreshedComponents(comps, bl, sn).localCheckpoint(true)
        bands = bands.union(
          nb.select(col("doc_id"), col("band"), col("h1"), col("h2")))
          .localCheckpoint(true)
      }

      // --- ground truth: union-find over the full corpus pair graph ------
      val allDf = docs.toDF("doc_id", "text")
      val pairs = Dedup.pairsFromBands(Dedup.bandSignatures(allDf))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val uf = unionFind(pairs)
      val expect = docs.map { case (id, _) => id -> uf.getOrElse(id, id) }.toMap
      val got = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect,
        s"trial $trial: ${docs.size} docs, ${pairs.size} pairs, " +
          s"${batches.size} batches")
    }
  }
}
