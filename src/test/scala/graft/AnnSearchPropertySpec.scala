package graft

import scala.util.Random

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) properties for the IVF serving
  * path ([[Similarity.annSearch]] over [[Similarity.assignCells]]):
  *
  *  1. EXACTNESS AT FULL PROBE — with nprobe = 16 (every cell probed)
  *     the index answers IDENTICALLY to brute-force cosine top-k:
  *     cell partitioning is a pure re-layout, so probing everything
  *     must recover the exact answer regardless of how the centroids
  *     landed. This is the property that separates "approximate
  *     because we prune" from "wrong".
  *  2. SUBSET AT PARTIAL PROBE — with nprobe < 16 every returned
  *     neighbor is a member of a probed cell, ranked in exact cosine
  *     order within that candidate set (the standard IVF contract:
  *     recall loss only ever comes from unprobed cells, never from
  *     mis-ranking).
  *
  * Ground truth is computed driver-side over the same double vectors
  * with the same left-to-right dot-product fold the native
  * cosine_sim expression uses, so comparisons are exact (no epsilon).
  */
class AnnSearchPropertySpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) {
      dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  test("nprobe=16 equals brute force; nprobe<16 is exact within probed cells") {
    import spark.implicits._
    val rnd = new Random(424242)
    for (trial <- 0 until 3) {
      val n = 80 + rnd.nextInt(60)
      val dim = 8
      // clumped corpus (some near-identical pairs) + uniform noise
      val vecs: Seq[(Long, Seq[Double])] = (0 until n).map { i =>
        val base =
          if (i % 7 == 0 && i > 0) // near-clone of an earlier vector
            (0 until dim).map(j => rnd.nextGaussian() * 0.01 +
              math.sin(0.7 * (i % 13) + j))
          else (0 until dim).map(_ => rnd.nextGaussian())
        (i.toLong, base.map(x => math.rint(x * 1000) / 1000.0))
      }
      val e = vecs.toDF("vec_id", "v")
      val seeds = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val cents = Similarity.trainedCentroids(e, seeds).localCheckpoint(true)
      val cells = Similarity.assignCells(e, cents).join(e, "vec_id")
      val cellOf = cells.select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val qIds = Seq.fill(5)(rnd.nextInt(n).toLong).distinct
      val queries = e.filter(col("vec_id").isin(qIds: _*))
        .select(col("vec_id").as("q_id"), col("v"))
      val byId = vecs.map { case (id, v) => id -> v.toArray }.toMap
      val k = 3

      // ---- property 1: full probe == brute force ----
      val full = Similarity.annSearch(queries, cents, cells, 16, k)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
      qIds.foreach { q =>
        val brute = byId.keys.filter(_ != q).toSeq
          .map(c => (c, cos(byId(q), byId(c))))
          .sortBy { case (c, s) => (-s, c) }
          .take(k).map(_._1)
        assert(full(q) === brute,
          s"trial $trial query $q: full-probe IVF must equal brute force")
      }

      // ---- property 2: partial probe is exact within probed cells ----
      val nprobe = 1 + rnd.nextInt(3)
      val part = Similarity.annSearch(queries, cents, cells, nprobe, k)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
      // re-derive the probed cells exactly as annSearch ranks them
      // (quantized-sim key, lowest cent_id on ties)
      val centRows = cents.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      qIds.foreach { q =>
        val probed = centRows.toSeq
          .map { case (cid, cv) =>
            (cid, math.floor(cos(byId(q), cv) * 4503599627370496.0)) }
          .sortBy { case (cid, key) => (-key, cid) }
          .take(nprobe).map(_._1).toSet
        val cands = byId.keys
          .filter(c => c != q && probed.contains(cellOf(c))).toSeq
        val expect = cands.map(c => (c, cos(byId(q), byId(c))))
          .sortBy { case (c, s) => (-s, c) }
          .take(k).map(_._1)
        assert(part.getOrElse(q, Seq.empty) === expect,
          s"trial $trial query $q nprobe=$nprobe: partial probe must be " +
            "exact over the probed cells")
      }
    }
  }
}
