package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 operators (q114–q116) beyond the
  * driver's oracle hash-match: the leakage audit partitions exactly
  * q35's pair set, novelty is a valid fraction of each source's
  * shingle inventory, and the per-label centroid drift is a valid
  * cosine over all vectors.
  */
class Round7OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q114 partitions q35's pair set exactly across split combos") {
    val total = run("q114_split_leakage")
      .agg(sum(col("n_pairs"))).collect().head.getLong(0)
    val pairs = run("q35_ngram_jaccard").count()
    assert(total === pairs,
      s"every near-dup pair lands in exactly one split combo: $total vs $pairs")
    val combos = run("q114_split_leakage")
      .select(col("split_lo"), col("split_hi")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(combos.forall { case (lo, hi) => lo <= hi }, combos.mkString(";"))
  }

  test("q115 novelty is a valid fraction of each source's inventory") {
    val rows = run("q115_ngram_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= n, r.toString)
      assert(frac >= 0.0 && frac <= 1.0, r.toString)
    }
  }

  test("q117 recall is a valid fraction per query, GT is 3 rows each") {
    val rows = run("q117_ivfpq_recall").collect()
    assert(rows.length == 10, s"one row per query, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_gt")) === 3L, r.toString)
      val rec = r.getDouble(r.fieldIndex("recall_at_3"))
      assert(rec >= 0.0 && rec <= 1.0, r.toString)
      assert(r.getLong(r.fieldIndex("n_hit")) <= 3L, r.toString)
    }
  }

  test("q118 spectrum accounts for every posting exactly once") {
    val rows = run("q118_df_spectrum").collect()
    assert(rows.nonEmpty)
    val postings = rows.map(r => r.getLong(r.fieldIndex("postings"))).sum
    // independent recount: distinct (doc, shingle) pairs in the corpus
    val expected = Tables(spark, sf001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as("s"))
      .distinct().count()
    assert(postings === expected,
      s"bucket posting mass must sum to the corpus posting count: $postings vs $expected")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("capped_postings"))
        <= r.getLong(r.fieldIndex("postings")), r.toString)
    }
  }

  test("q119 confusion matrix covers every document, fractions sum to 1") {
    val rows = run("q119_langid_confusion").collect()
    val total = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    val docs = Tables(spark, sf001, "documents").count()
    assert(total === docs, s"every doc lands in one cell: $total vs $docs")
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val fracSum = cells.map(r => r.getDouble(r.fieldIndex("frac"))).sum
      assert(math.abs(fracSum - 1.0) < 1e-3, s"$lang fracs sum to $fracSum")
    }
  }

  test("q120 histogram docs/clusters reconcile with q57's components") {
    val rows = run("q120_cluster_hist").collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val nClusters = rows.map(r => r.getLong(r.fieldIndex("n_clusters"))).sum
    val comp = run("q57_dedup_components")
    assert(nDocs === comp.count(), "every clustered doc is bucketed once")
    assert(nClusters === comp.select(col("comp")).distinct().count())
    assert(nClusters <= nDocs)
  }

  test("q121 grid covers every document; deciles are 1..10 and balanced") {
    val rows = run("q121_length_quality_grid").collect()
    val total = rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val docs = Tables(spark, sf001, "documents").count()
    assert(total === docs, s"every doc lands in one decile: $total vs $docs")
    val deciles = rows.map(_.getLong(0)).sorted
    assert(deciles.forall(d => d >= 1 && d <= 10), deciles.mkString(","))
    rows.foreach { r =>
      val mq = r.getDouble(r.fieldIndex("mean_quality"))
      assert(mq >= 0.0 && mq <= 1.0, r.toString)
    }
  }

  test("q116 drift is a valid cosine and covers every vector") {
    val rows = run("q116_centroid_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos >= -1.0 && cos <= 1.0, r.toString)
    }
    val covered = rows.map(_.getLong(1)).sum
    val vecs = Tables(spark, sf001, "embeddings").count()
    assert(covered === vecs, s"per-label counts must cover the corpus: $covered vs $vecs")
  }
}
