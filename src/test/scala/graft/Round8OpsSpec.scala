package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 additions q122–q126 beyond the
  * driver's oracle hash-match: collocation support/top-k contracts and
  * the q69-style no-forced-broadcast pin, IVF balance mass
  * conservation, PQ error-report invariants, TV-distance bounds, and
  * the profiler's per-branch column pruning.
  */
class Round8OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q122 respects min support, caps at 25, and never forces the marginal joins") {
    val rows = run("q122_collocations").collect()
    assert(rows.length == 25, s"top-25 contract, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("c12")) >= 5L, r.toString)
      assert(r.getDouble(r.fieldIndex("lift")) > 0.0, r.toString)
    }
    val df = run("q122_collocations")
    // both marginal tables are vocabulary-sized at web scale (the q69
    // lesson): the equi-joins must carry no broadcast hint — only the
    // 1-row N total may be hint-broadcast
    val equiHints = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isDefined => j.hint
    }
    assert(equiHints.nonEmpty, "expected the two marginal equi-joins")
    equiHints.foreach { h =>
      assert(h.leftHint.isEmpty && h.rightHint.isEmpty,
        s"vocabulary-sized join side must not be hint-forced: $h")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-25 must be TakeOrderedAndProject, not a sort:\n$p")
  }

  test("q123 conserves the corpus across cells with valid means") {
    val rows = run("q123_ivf_balance").collect()
    val n = Tables(spark, sf001, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n,
      "every vector lands in exactly one cell")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("cell")) >= 0L
        && r.getLong(r.fieldIndex("cell")) <= 15L, r.toString)
      val m = r.getDouble(r.fieldIndex("mean_cos"))
      assert(m >= -1.0 && m <= 1.0 + 1e-9, r.toString)
    }
  }

  test("q124 reports all 8 subspaces over the full corpus") {
    val rows = run("q124_pq_error").collect()
    assert(rows.length == 8, s"one row per subspace, got ${rows.length}")
    val n = Tables(spark, sf001, "embeddings").count()
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_vecs")) === n, r.toString)
      // the codebook holds 16 codewords (vec_id < 16)
      assert(r.getLong(r.fieldIndex("codes_used")) <= 16L, r.toString)
      assert(r.getDouble(r.fieldIndex("mean_err")) >= 0.0, r.toString)
    }
  }

  test("q125 TV distances are bounded and doc mass is conserved") {
    val rows = run("q125_source_drift").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val docs = Tables(spark, sf001, "documents").count()
    assert(total === docs, s"per-source doc counts must sum to the corpus: $total vs $docs")
    rows.foreach { r =>
      val tv = r.getDouble(r.fieldIndex("tv_dist"))
      assert(tv >= 0.0 && tv <= 1.0, r.toString)
    }
  }

  test("q126 profiles consistently and each branch scan prunes to its column") {
    val df = run("q126_profile")
    val rows = df.collect()
    assert(rows.length == 6, s"one row per profiled column, got ${rows.length}")
    val nRows = rows.map(_.getLong(rows.head.fieldIndex("n_rows"))).distinct
    assert(nRows.length == 1, s"all branches scan the same table: $nRows")
    rows.foreach { r =>
      val (nulls, dist) = (r.getLong(r.fieldIndex("n_nulls")),
        r.getLong(r.fieldIndex("n_distinct")))
      assert(nulls >= 0L && dist <= nRows.head - nulls, r.toString)
      assert(r.getString(r.fieldIndex("min_s")).nonEmpty
        && r.getString(r.fieldIndex("max_s")).nonEmpty, r.toString)
    }
    // pushdown evidence: every parquet scan in the plan reads exactly
    // one of the six event columns (ReadSchema single-field) — the
    // point of the union-of-branches shape over a k×Expand aggregate
    val evCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val scans = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema:")).toSeq
    assert(scans.nonEmpty, "expected parquet scans in the plan")
    scans.foreach { l =>
      val read = evCols.count(c => l.contains(c + ":"))
      assert(read <= 1, s"branch scan must prune to one column: $l")
    }
  }

  test("q127 flow counts match an independent per-pair recount") {
    val flows = run("q127_dup_provenance").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(flows.nonEmpty)
    flows.keys.foreach { case (a, b) => assert(a < b, s"unordered pair: $a,$b") }
    // recount from q57's public component table
    val ps = run("q57_dedup_components")
      .join(Tables(spark, sf001, "documents")
        .select(col("doc_id"), col("source")), "doc_id")
      .select(col("comp"), col("source")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).values
      .flatMap { g =>
        val ss = g.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(flows === ps, s"engine $flows vs recount $ps")
  }

  test("q129 conserves clusters and docs across density buckets") {
    val rows = run("q129_cluster_density").collect()
    val comp = run("q57_dedup_components")
    val docs = comp.count()
    val clusters = comp.select(col("comp")).distinct().count()
    assert(rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum === docs,
      "every clustered doc lands in exactly one density bucket")
    assert(rows.map(r => r.getLong(r.fieldIndex("n_clusters"))).sum === clusters,
      "every cluster lands in exactly one density bucket")
    rows.foreach { r =>
      val m = r.getDouble(r.fieldIndex("mean_density"))
      assert(m > 0.0 && m <= 1.0, r.toString)
      val b = r.getLong(r.fieldIndex("bucket"))
      assert(b >= 0L && b <= 9L, r.toString)
    }
  }

  test("q130 sweep points are complete and reproduce the single-point eval") {
    val rows = run("q130_probe_curve").collect()
      .map(r => (r.getInt(r.fieldIndex("nprobe")),
        r.getLong(r.fieldIndex("n_gt")), r.getLong(r.fieldIndex("n_hit")),
        r.getDouble(r.fieldIndex("recall_at_3")))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4), rows.mkString(";"))
    rows.foreach { case (_, gt, hit, rec) =>
      assert(gt === 30L, s"10 queries x top-3 GT: $gt")
      assert(hit >= 0L && hit <= gt && rec >= 0.0 && rec <= 1.0, s"$hit/$gt")
    }
    // NOTE deliberately NOT asserted: recall monotonicity in nprobe.
    // The candidate SET is monotone, but recall@3 compares the fixed
    // top-3 ADC cut — extra candidates from more cells bring their
    // quantization-error imposters, which can push true neighbors out
    // of the cut (observed on the random sf0.001 vectors: 8/30 at
    // nprobe=1 vs 6/30 at nprobe=2). That dip is the phenomenon the
    // curve exists to expose, not a bug.
    // The nprobe=2 slice must agree with q117's per-query recall eval:
    val q117hits = run("q117_ivfpq_recall")
      .agg(sum(col("n_hit"))).collect().head.getLong(0)
    assert(rows.find(_._1 == 2).get._3 === q117hits,
      "sweep point nprobe=2 must reproduce the single-point eval")
  }

  test("q131 covers every label and vector with valid accuracies") {
    val rows = run("q131_label_purity").collect()
    val e = Tables(spark, sf001, "embeddings")
    val perLabel = e.groupBy(col("label")).count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(rows.length === perLabel.size, "one row per label")
    rows.foreach { r =>
      val (l, n, c, a) = (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getDouble(3))
      assert(n === perLabel(l), s"label $l: $n vs ${perLabel(l)}")
      assert(c >= 0L && c <= n && a >= 0.0 && a <= 1.0, r.toString)
    }
  }

  test("q132 audits every FK edge with an anti-join-consistent count") {
    val rows = run("q132_fk_audit").collect()
    assert(rows.length === 6, s"six FK edges, got ${rows.length}")
    rows.foreach { r =>
      val (n, orph, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(orph >= 0L && orph <= n && rate >= 0.0 && rate <= 1.0, r.toString)
    }
    // independent recount of one edge via a real anti-join
    val li = Tables(spark, sf001, "lineitem")
    val o = Tables(spark, sf001, "orders")
    val expected = li.join(o,
      li("l_orderkey") === o("o_orderkey"), "left_anti").count()
    val reported = rows
      .find(_.getString(0) == "lineitem.l_orderkey->orders").get.getLong(2)
    assert(reported === expected, s"$reported vs anti-join $expected")
  }

  test("q133 mines trigrams in order with a conserved total") {
    val df = run("q133_event_trigrams")
    val rows = df.collect()
    assert(rows.length === 20, s"top-20 contract, got ${rows.length}")
    val ns = rows.map(r => r.getLong(r.fieldIndex("n")))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"descending counts: ${ns.toSeq}")
    // every user with c events contributes exactly max(0, c-2) trigrams
    val totalTrigrams = Tables(spark, sf001, "events")
      .groupBy(col("user_id")).count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).collect().head.getLong(0)
    assert(ns.sum <= totalTrigrams, s"${ns.sum} > corpus total $totalTrigrams")
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "global top-20 must be TakeOrderedAndProject")
  }

  test("q134 dedup impact is consistent with its component operators") {
    val rows = run("q134_dedup_impact").collect()
    val docs = Tables(spark, sf001, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count(),
      "per-source doc counts sum to the corpus")
    // exact-dup total matches q34's own keeper arithmetic
    val exactTotal = docs.count() -
      docs.select(md5(col("text"))).distinct().count()
    assert(rows.map(r => r.getLong(r.fieldIndex("n_exact_dup"))).sum
      === exactTotal, "exact dups = docs minus distinct fingerprints")
    // near-extra total = non-canonical component members that are
    // exact-group keepers
    rows.foreach { r =>
      val (n, e, x, k) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
      assert(e + x <= n && k >= 0.0 && k <= 1.0, r.toString)
    }
  }

  test("q135 ranks every hour window with at most three ordered rows") {
    val rows = run("q135_trending_batch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val byWin = rows.groupBy(_._1)
    val expectedWins = Tables(spark, sf001, "events")
      .select(expr("unix_micros(ts) div 3600000000").as("w"))
      .distinct().count()
    assert(byWin.size.toLong === expectedWins,
      s"every hour window ranked: ${byWin.size} vs $expectedWins")
    byWin.values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.length <= 3 && sorted.map(_._4).toSeq ===
        (1 to sorted.length), g.mkString(";"))
      val ns = sorted.map(_._3)
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"counts descend within the window: ${ns.toSeq}")
    }
  }

  test("q136 split has ZERO near-dup leakage and conserves the corpus") {
    val rows = run("q136_cluster_safe_split").collect()
    val docs = Tables(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(1)).sum === docs, "every doc assigned once")
    // the property the operator exists for: no q35 pair straddles splits
    val assign = graft.operators.TrainPrep
      .clusterSafeAssignment(spark, sf001)
      .select(col("doc_id"), col("split"))
    val pairs = run("q35_ngram_jaccard").select(col("da"), col("db"))
    val leaked = pairs
      .join(assign.select(col("doc_id").as("da"), col("split").as("sa")), "da")
      .join(assign.select(col("doc_id").as("db"), col("split").as("sb")), "db")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked === 0L, s"$leaked near-dup pairs straddle splits")
    // sanity: the doc-keyed q112 scheme DOES leak on this corpus, so
    // the zero above is earned by cluster keying, not by luck
    val docKeyed = Tables(spark, sf001, "documents")
      .select(col("doc_id"), expr("pmod(cast(conv(substr(md5(concat('split-', " +
        "cast(doc_id as string))), 1, 15), 16, 10) as bigint), 100)").as("h"))
      .withColumn("split", when(col("h") < 80, "train")
        .when(col("h") < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("split"))
    val naiveLeaked = pairs
      .join(docKeyed.select(col("doc_id").as("da"), col("split").as("sa")), "da")
      .join(docKeyed.select(col("doc_id").as("db"), col("split").as("sb")), "db")
      .filter(col("sa") =!= col("sb")).count()
    assert(naiveLeaked > 0L,
      "fixture must contain cross-split near-dup pairs under doc keying")
  }

  test("q137 slopes match a driver-side recomputation from exact moments") {
    val rows = run("q137_quality_length_slope").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(r.fieldIndex("slope_microq_per_token")),
        r.getDouble(r.fieldIndex("intercept_microq")))).toMap
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf001, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
      .select(col("source"), size(col("t")).cast("long").as("x"),
        expr("""cast(round(round(least(1.0d, size(t) / 100.0d)
            * (size(array_distinct(t)) / size(t)), 6) * 1000000d, 0)
            as bigint)""").as("yf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (src, g) =>
      val n = g.length.toDouble
      val (sx, sy) = (g.map(_._2).sum.toDouble, g.map(_._3).sum.toDouble)
      val sxy = g.map(p => BigInt(p._2) * BigInt(p._3)).sum.toDouble
      val sxx = g.map(p => BigInt(p._2) * BigInt(p._2)).sum.toDouble
      val den = n * sxx - sx * sx
      if (den == 0.0) assert(!rows.contains(src), s"$src must be filtered")
      else {
        val slope = (n * sxy - sx * sy) / den
        val (nDocs, s6, i6) = rows(src)
        assert(nDocs === g.length.toLong, src)
        assert(math.abs(s6 - math.rint(slope * 1e6) / 1e6) < 1e-9,
          s"$src slope $s6 vs recomputed $slope")
        assert(math.abs(i6 - math.rint((sy - slope * sx) / n * 1e6) / 1e6)
          < 1e-9, s"$src intercept $i6")
      }
    }
  }

  test("q138 gap audit conserves events and bounds gaps by the span") {
    val rows = run("q138_gap_audit").collect()
    val ev = Tables(spark, sf001, "events")
    assert(rows.map(_.getLong(1)).sum === ev.count(),
      "every event counted under exactly one type")
    val span = ev.agg(expr("max(unix_micros(ts)) - min(unix_micros(ts))"))
      .collect().head.getLong(0)
    rows.foreach { r =>
      val (n, mx, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mx > 0L && mx <= span, r.toString)
      assert(over >= 0L && over <= n - 1, r.toString)
    }
  }

  test("q128 waterfilling is budget-feasible and the cap is maximal") {
    val rows = run("q128_budget_waterfill").collect()
    val docs = Tables(spark, sf001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val budget = docs / 2
    val byCap = rows.map { r =>
      (r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("alloc")),
        r.getInt(r.fieldIndex("capped")))
    }
    byCap.foreach { case (n, a, c) =>
      assert(a <= n && (c == 1) == (a < n), s"($n,$a,$c)")
    }
    val total = byCap.map(_._2).sum
    assert(total <= budget, s"allocation $total must fit the budget $budget")
    val capped = byCap.filter(_._3 == 1)
    if (capped.nonEmpty) {
      val cap = capped.map(_._2).distinct
      assert(cap.length == 1, s"all capped sources level at one cap: ${cap.toSeq}")
      // maximality: raising the cap by one token overshoots the budget
      val plusOne = byCap.map { case (n, _, _) => math.min(n, cap.head + 1) }.sum
      assert(plusOne > budget, s"cap ${cap.head} must be maximal: $plusOne <= $budget")
    }
  }
}
