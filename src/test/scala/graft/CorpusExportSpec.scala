package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-8 additions beyond the driver's
  * oracle hash-match: Heaps-curve conservation (q139), sequence-export
  * truncation and single-exchange plan (q140), and the curated-corpus
  * capstone's exclusion guarantees (q141).
  */
class CorpusExportSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q139 curve conserves tokens and vocabulary and is monotone") {
    val rows = run("q139_heaps_vocab").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty && rows.last._1 <= 19, "buckets live in 0..19")
    val toks = Tables(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
    assert(rows.last._4 === toks.count(), "cum_tokens ends at the corpus total")
    assert(rows.last._5 === toks.distinct().count(),
      "cum_vocab ends at the corpus vocabulary")
    assert(rows.map(_._2).sum === rows.last._4, "bucket tokens sum to the curve")
    assert(rows.map(_._3).sum === rows.last._5, "new terms sum to the vocab")
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._4 > a._4 && b._5 >= a._5, s"cumulative curves are monotone: $a -> $b")
    }
    // Heaps shape: later batches contribute fewer novel terms than the
    // first batch (the whole reason the curve is worth plotting)
    assert(rows.head._3 > rows.last._3,
      "novelty decays from the first batch to the last")
  }

  test("q140 sequences truncate at 32, count honestly, and ride one exchange") {
    val df = run("q140_seq_export")
    val rows = df.collect()
    val users = Tables(spark, sf001, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong === users, "one row per user")
    rows.foreach { r =>
      val (n, nSeq, seq) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(nSeq === math.min(n, 32L), r.toString)
      assert(seq.split(" ").length.toLong === nSeq,
        s"seq token count equals n_seq: $r")
    }
    // brute-force recount for the hottest user
    val hot = rows.maxBy(_.getLong(1))
    val expect = Tables(spark, sf001, "events")
      .filter(col("user_id") === hot.getLong(0))
      .select(col("event_type"), col("ts"), col("event_id"))
      .collect().sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      .take(32).map(_.getString(0)).mkString(" ")
    assert(hot.getString(3) === expect, "hottest user's sequence recount")
    // the window and the aggregation share the user_id partitioning:
    // exactly one exchange in the whole plan (AQE's toString repeats
    // the initial plan below the final one — count the final only)
    val planStr = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = planStr.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"window + agg must share one user_id exchange:\n$planStr")
  }

  test("q143 audit conserves banded docs and bounds the pair volume") {
    val rows = run("q143_lsh_bucket_audit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq === Seq(0, 1, 2, 3), "all four bands")
    val banded = Tables(spark, sf001, "documents")
      .filter(size(split(col("text"), " ")) >= 3).count()
    rows.foreach { case (b, nBuckets, maxB, colliding, pairs) =>
      assert(nBuckets <= banded && maxB >= 1 && maxB <= banded, s"band $b")
      assert(colliding <= banded, s"band $b colliding_docs bound")
      assert(pairs >= maxB * (maxB - 1) / 2,
        s"band $b pair volume at least its hottest bucket's")
    }
    // every band buckets every banded doc exactly once: sizes sum back
    val sizesSum = graft.operators.Dedup
      .bandSignatures(Tables(spark, sf001, "documents"))
      .groupBy(col("band")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (b, _, _, _, _) =>
      assert(sizesSum(b) === banded, s"band $b covers the banded corpus")
    }
  }

  test("q144 grid conserves the corpus and the dup set") {
    val rows = run("q144_quality_dup_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables(spark, sf001, "documents").count()
    val dups = run("q57_dedup_components").count()
    assert(rows.map(_._2).sum === docs, "every doc lands in one bucket")
    assert(rows.map(_._3).sum === dups, "every clustered doc counted once")
    rows.foreach { case (qb, n, d, rate) =>
      assert(qb >= 0 && qb <= 9 && d <= n && rate >= 0.0 && rate <= 1.0,
        s"($qb, $n, $d, $rate)")
    }
  }

  test("q145/q148 conserve the token stream; q146 conserves the dup set") {
    val docs = Tables(spark, sf001, "documents")
    val totalToks = docs.select(explode(split(col("text"), " "))).count()

    val pack = run("q145_pack_efficiency").collect()
    assert(pack.map(r => r.getLong(r.fieldIndex("tokens"))).sum === totalToks,
      "packed tokens sum to the corpus")
    pack.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_bins")) >= 1L
        && r.getDouble(r.fieldIndex("fill_rate")) > 0.0, r.toString)
    }

    val prof = run("q148_token_len_profile").collect()
    assert(prof.map(r => r.getLong(1)).sum === totalToks,
      "length histogram conserves tokens")
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(prof.map(r => r.getLong(2)).sum === vocab,
      "distinct terms partition by length")
    assert(math.abs(prof.map(r => r.getDouble(3)).sum - 1.0) < 1e-3,
      "shares sum to ~1")

    val spans = run("q146_cluster_span").collect()
    val comp = run("q57_dedup_components")
    assert(spans.map(_.getLong(1)).sum === comp.count(),
      "every clustered doc in exactly one span row")
    spans.foreach { r =>
      val (n, span, srcs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(span >= n - 1, s"distinct ids force span >= n-1: $r")
      assert(srcs >= 1L, r.toString)
    }
  }

  test("q147 matrix is a valid Jaccard on source gram sets") {
    val rows = run("q147_source_gram_matrix").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (shared, jac)) =>
      assert(a < b, "ordered pairs only")
      assert(shared >= 1L && jac > 0.0 && jac <= 1.0, s"($a,$b,$shared,$jac)")
    }
    // driver recount of the heaviest pair from raw gram sets
    val ((sa, sb), (shared, _)) = rows.maxBy(_._2._1)
    val g = Tables(spark, sf001, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(t)-7), i -> concat_ws(' ', slice(t, i, 8)))"))
        .as("gtext"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val setA = g.collect { case (s, x) if s == sa => x }.toSet
    val setB = g.collect { case (s, x) if s == sb => x }.toSet
    assert(setA.intersect(setB).size.toLong === shared,
      s"heaviest pair ($sa,$sb) recount")
  }

  test("q149 coverage curve is monotone and exact against a driver rank") {
    val rows = run("q149_vocab_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(100L, 500L, 1000L, 5000L))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, s"monotone in k: $a -> $b")
    }
    rows.foreach { case (_, _, cov, _) => assert(cov > 0.0 && cov <= 1.0) }
    // exact recount: driver-side full rank (fine at test SF) must give
    // the same covered mass the value-domain plan computed
    val freqs = Tables(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
    rows.foreach { case (k, covered, _, vocabUsed) =>
      val expect = freqs.take(k.toInt).map(_._2).sum
      assert(covered === expect, s"k=$k: $covered vs ranked $expect")
      assert(vocabUsed === math.min(k, freqs.length.toLong))
    }
  }

  test("q150 forecast is monotone in cap and matches the spectrum arithmetic") {
    val rows = run("q150_cap_forecast").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L, 64L))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, s"monotone in cap: $a -> $b")
    }
    rows.foreach { case (_, _, share) => assert(share > 0.0 && share <= 1.0) }
    // driver recount of the df spectrum from raw text shingles
    val dfByShingle = Tables(spark, sf001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as("s"))
      .distinct().groupBy(col("s")).count().collect()
      .map(_.getLong(1))
    rows.foreach { case (cap, pairs, _) =>
      val expect = dfByShingle.collect {
        case df if df >= 2 && df <= cap => df * (df - 1) / 2
      }.sum
      assert(pairs === expect, s"cap=$cap: $pairs vs spectrum $expect")
    }
  }

  test("q141 ships no benchmark doc, no contaminated doc, no dup, no short doc") {
    val out = run("q141_corpus_rewrite").collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getString(1) == "src0"), "benchmark source excluded")
    assert(out.forall(_.getLong(4) >= 20L), "quality floor holds")
    val fps = out.map(_.getString(5))
    assert(fps.distinct.length === fps.length, "one doc per normalized fp")
    // q45 is the independent contamination detector: no shipped doc may
    // carry a single benchmark 8-gram hit
    val shippedIds = out.map(_.getLong(0)).toSet
    val contaminated = run("q45_decontaminate").collect()
      .filter(_.getLong(1) > 0).map(_.getLong(0)).toSet
    assert(shippedIds.intersect(contaminated).isEmpty,
      "no contaminated doc ships")
    // split fractions: deterministic md5 keying lands near 80/10/10
    val bySplit = out.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("val", 0))
    assert(bySplit("train") > bySplit.getOrElse("test", 0))
  }
}
