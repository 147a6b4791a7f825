package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 operators (q76–q80) beyond the
  * driver's oracle hash-match: chunk tiling covers every token with
  * the promised overlap, BM25 ranks a saturating/length-normalized
  * score the way the formula says, decay weights halve per day, the
  * rolling RANGE frame matches a brute-force recount, and IVF-PQ is
  * replayed end-to-end by an independent driver-side replica.
  */
class Round4OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q76 chunks tile documents: stride 24, window 32, short tails folded") {
    val docs = Tables(spark, sf001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("q76_chunk")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getInt(2))).sortBy(_._1)
      }
    assert(chunks.keySet == docs.keySet, "every document is chunked")
    chunks.foreach { case (id, cs) =>
      val n = docs(id)
      // chunk indexes are the consecutive stride positions whose
      // window holds ≥8 tokens (plus index 0 unconditionally)
      val expectedStarts = (1 to n by 24).filter(st => st == 1 || st <= n - 7)
      assert(cs.map(_._1) sameElements expectedStarts.indices.map(_.toLong),
        s"doc $id: contiguous chunk indexes")
      cs.zip(expectedStarts).foreach { case ((_, tok), st) =>
        assert(tok == math.min(32, n - st + 1), s"doc $id chunk at $st")
      }
      // tiling: chunks jointly cover all n tokens (last kept chunk
      // reaches the end or the folded tail is ≤7 tokens of overlap-
      // covered text)
      val lastStart = expectedStarts.last
      assert(lastStart + 31 >= n || n - (lastStart + 31) <= 7)
    }
  }

  test("q77 BM25 scores saturate in tf and penalize long documents") {
    val rows = run("q77_bm25").collect()
    assert(rows.nonEmpty)
    val byTerm = rows.groupBy(_.getString(0))
    assert(byTerm.size <= 5, "at most 5 query terms")
    byTerm.values.foreach { rs =>
      val rks = rs.map(_.getInt(4)).sorted
      assert(rks.sameElements(1 to rs.length) && rs.length <= 10,
        "dense ranks 1..k, k ≤ 10")
      // scores are positive and non-increasing in rank
      val byRk = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRk.forall(_ > 0))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b })
    }
    // saturation bound: tf·(k1+1)/(tf+k1·…) < k1+1 = 2.2, and the
    // rational idf is < n_docs, so score < 2.2·n_docs
    val nDocs = Tables(spark, sf001, "documents").count()
    assert(rows.forall(_.getDouble(3) < 2.2 * nDocs))
  }

  test("q78 decayed engagement halves per day of age") {
    val out = run("q78_time_decay").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute-force recompute with the same fixed-point contract
    val e = Tables(spark, sf001, "events")
      .select(col("user_id"), col("value"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val mx = e.map(_._3).max
    val expected = e.groupBy(_._1).map { case (u, rs) =>
      val s = rs.map { case (_, v, us) =>
        val d = math.min((mx - us) / 86400000000L, 62L).toInt
        math.round(v / (1L << d).toDouble * 1e6)
      }.sum
      u -> (rs.length.toLong,
        BigDecimal(s / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out == expected)
  }

  test("q79 rolling RANGE frame matches a brute-force trailing-hour recount") {
    val rows = run("q79_rolling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._2)
    byUser.values.foreach { rs =>
      val evs = rs.map(r => (r._3, r._1)).sortBy(identity) // (us, event_id)
      rs.foreach { case (_, _, us, n, sum) =>
        val inFrame = rs.filter(o => o._3 >= us - 3600000000L && o._3 <= us)
        assert(n == inFrame.length, s"frame count at $us")
      }
      val _ = evs
    }
    // fixed-point sum agrees on one recomputed user
    val u = byUser.keys.min
    val vals = Tables(spark, sf001, "events")
      .filter(col("user_id") === u)
      .select(expr("unix_micros(ts)").as("us"),
        expr("cast(round(value * 100, 0) as bigint)").as("cv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    byUser(u).foreach { case (_, _, us, _, sum) =>
      val exp = vals.filter(v => v._1 >= us - 3600000000L && v._1 <= us).map(_._2).sum
      assert(math.abs(sum - exp / 100.0) < 1e-9, s"rolling sum at $us")
    }
  }

  test("q80 IVF-PQ matches an independent single-machine replica") {
    // full scalar replay of the operator — same fold order (strict
    // left-to-right), same quantized keys — so any divergence in the
    // distributed plan (wrong cell, wrong code, wrong table lookup)
    // shows up as a value difference here
    val vecs = Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def qk(x: Double): Long = math.floor(x * 4503599627370496d).toLong
    val seeds = (0L until 16L).map(i => i -> vecs(i)).toMap
    def cellOf(v: Array[Double]): Long =
      (0L until 16L).maxBy(c => qk(cos(v, seeds(c))) * 16 + (15 - c))
    def sub(v: Array[Double], m: Int): Array[Double] = v.slice(m * 8, m * 8 + 8)
    def d2(a: Array[Double], b: Array[Double]): Double =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    def codeOf(v: Array[Double], m: Int): Long =
      (0L until 16L).map(c =>
        math.floor(d2(sub(v, m), sub(seeds(c), m)) * 1125899906842624d).toLong * 64 + c)
        .min % 64
    val expected = (0L until 10L).flatMap { q =>
      val ranked = (0L until 16L).sortBy(c => (-qk(cos(vecs(q), seeds(c))), c))
      val probed = ranked.take(2).toSet
      val cands = vecs.keys.filter(c => c != q && probed.contains(cellOf(vecs(c))))
      val dtab = (for (m <- 0 until 8; c <- 0L until 16L) yield (m, c) ->
        math.round(d2(sub(vecs(q), m), sub(seeds(c), m)) * 1099511627776d)).toMap
      cands.map(c => (q, c,
          (0 until 8).map(m => dtab((m, codeOf(vecs(c), m)))).sum))
        .toSeq.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((_, c, afx), i) => (q, c,
          BigDecimal(afx / 1099511627776d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          i + 1) }
    }.toSet
    val got = run("q80_ivfpq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("q81 median/MAD match a brute-force recount and bound the outliers") {
    val docs = Tables(spark, sf001, "documents")
      .select(col("lang"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val expected = docs.groupBy(_._1).map { case (lang, rs) =>
      val nts = rs.map(_._2.toDouble).toSeq
      val med = median(nts)
      val ads = nts.map(x => math.abs(x - med))
      val mad = median(ads)
      lang -> (rs.length.toLong, med, mad,
        ads.count(_ > 3.0 * mad).toLong)
    }
    val got = run("q81_mad").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("q82 salted join equals the plain unsalted join") {
    val plain = SparkEntry.queries("q82_salted_join")(spark, sf001) // salted
    val expected = {
      val o = Tables(spark, sf001, "orders")
      val l = Tables(spark, sf001, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(graft.functions.Exact.sumFixed(
            "l_extendedprice * (1 - l_discount)"), 2).as("revenue"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val got = plain.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("q83 picks the longest member of each q57 cluster as canonical") {
    val labels = run("q57_dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tokens = Tables(spark, sf001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = labels.groupBy(_._2).map { case (comp, ms) =>
      val best = ms.map(_._1).minBy(id => (-tokens(id), id))
      (comp, best, tokens(best), ms.length.toLong)
    }.toSet
    val got = run("q83_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == expected)
  }
}
