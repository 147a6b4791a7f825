package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** Cross-checks [[Similarity.lshNearDup]] — the parameterized core of
  * q44/q65/q68 — against an INDEPENDENT replica of the banded sign-LSH
  * pipeline (md5 plane signs, 24-bit signature, shiftright band-key
  * slicing, any-band collision, exact cosine rerank) on a corpus with
  * PLANTED near-duplicates.
  *
  * Why this exists: q65 runs at sim ≥ 0.9 where the driver's random
  * corpus yields zero pairs, so its oracle check is vacuous in that
  * regime. This spec builds a corpus where the ≥ 0.9 regime is
  * populated (exact duplicates and lightly perturbed copies) and
  * asserts the full result set — ids AND rounded sims — equals the
  * replica's, so a band-slice arithmetic bug cannot hide behind an
  * empty result.
  *
  * The replica recomputes everything from scratch (its own md5 coef,
  * its own left-to-right folds) rather than calling the library
  * helpers; both sides fold strictly left-to-right, so doubles match
  * bit-for-bit and the comparison is exact.
  */
class LshNearDupSpec extends SparkSpec {

  private val ppb = 6
  private val nBands = 4
  private val nPlanes = ppb * nBands
  private val dim = 64

  // Independent replica of the deterministic plane family.
  private def coef(p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p-$i".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 1.0 else -1.0
  }

  private def planeDot(v: Array[Double], p: Int): Double = {
    var a = 0.0
    var i = 0
    while (i < dim) { a += v(i) * coef(p, i); i += 1 }
    a
  }

  private def sig(v: Array[Double]): Long =
    (0 until nPlanes).map(p => if (planeDot(v, p) > 0) 1L << p else 0L).sum

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def fold(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += x(i) * y(i); i += 1 }
      s
    }
    fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue

  private def replica(vs: Map[Long, Array[Double]], simMin: Double)
      : Set[(Long, Long, Double)] = {
    val sigs = vs.map { case (id, v) => id -> sig(v) }
    val cands = for {
      (ia, sa) <- sigs.toSeq
      (ib, sb) <- sigs.toSeq
      if ia < ib
      if (0 until nBands).exists(b =>
        ((sa >> (ppb * b)) % (1L << ppb)) == ((sb >> (ppb * b)) % (1L << ppb)))
    } yield (ia, ib)
    cands.map { case (ia, ib) => (ia, ib, cosine(vs(ia), vs(ib))) }
      .collect { case (ia, ib, s) if s >= simMin => (ia, ib, round4(s)) }
      .toSet
  }

  test("planted near-dups: Spark pipeline equals independent replica at sim >= 0.9") {
    val rnd = new scala.util.Random(42)
    def randVec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)

    // 40 random base vectors; ids 100..103 are EXACT copies of 0..3,
    // ids 200..203 are lightly perturbed copies of 4..7 (sim ≈ 0.999).
    val base = (0L until 40L).map(i => i -> randVec()).toMap
    val exact = (0 until 4).map(i => (100L + i) -> base(i.toLong).clone())
    val pert = (0 until 4).map { i =>
      val v = base(4L + i).clone()
      v(i) = v(i) + 0.05f
      (200L + i) -> v
    }
    val all = base.toSeq ++ exact ++ pert

    val dir = java.nio.file.Files.createTempDirectory("lsh-neardup").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = all.map { case (id, v) => Row(id, v.toSeq, 0) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = Similarity
      .lshNearDup(spark, dir, ppb = ppb, nBands = nBands, K = 8, simMin = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    val vsD = all.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val want = replica(vsD, 0.9)

    // The ≥ 0.9 regime must actually be exercised — the planted exact
    // duplicates share all 24 sign bits, so all 4 collide in band 0
    // with sim 1.0 regardless of the random base draws.
    (0 until 4).foreach { i =>
      assert(want.contains((i.toLong, 100L + i, 1.0d)),
        s"exact-duplicate pair ($i, ${100 + i}) missing from replica")
    }
    assert(want.size >= 4)
    assert(got === want)
  }

  test("low-threshold regime (q68 shape) also equals the replica") {
    // Random vectors only — exercises the band keys on the background
    // distribution, the same observable q68_lsh_bands puts in front
    // of the DuckDB oracle.
    val rnd = new scala.util.Random(7)
    val vs = (0L until 120L)
      .map(i => i -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f)).toMap

    val dir = java.nio.file.Files.createTempDirectory("lsh-bands").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = vs.toSeq.map { case (id, v) => Row(id, v.toSeq, 0) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = Similarity
      .lshNearDup(spark, dir, ppb = ppb, nBands = nBands, K = 4, simMin = 0.2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = replica(vs.map { case (id, v) => id -> v.map(_.toDouble) }, 0.2)
    assert(want.nonEmpty)
    assert(got === want)
  }
}
