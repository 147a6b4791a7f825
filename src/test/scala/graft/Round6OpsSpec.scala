package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 operators (q107–q110) beyond the
  * driver's oracle hash-match: normalization is idempotent and its
  * fingerprint matches the unchanged text, the run profile matches a
  * driver-side brute force, the per-source deciles equal the fully
  * sorted per-source arrays' k-th elements, and the minhash error
  * table covers exactly the q35 pair set with estimates in [0, 1].
  */
class Round6OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q107 fingerprint equals md5 of text whenever nothing changed") {
    val rows = run("q107_normalize")
      .join(Tables(spark, sf001, "documents"), "doc_id")
      .select(col("doc_id"), col("norm_fp"), col("changed"),
        md5(col("text")).as("raw_fp"))
      .collect()
    assert(rows.nonEmpty)
    rows.filter(!_.getBoolean(2)).foreach { r =>
      assert(r.getString(1) == r.getString(3),
        s"doc ${r.getLong(0)}: unchanged text must keep its raw fingerprint")
    }
  }

  test("q108 run profile matches a driver-side brute force") {
    val docs = Tables(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("q108_token_runs").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val t = docs(r.getLong(0)).split(" ", -1)
      val adj = t.indices.drop(1).count(i => t(i) == t(i - 1))
      assert(r.getInt(1) == t.length && r.getInt(2) == adj
        && r.getInt(3) == t.length - adj,
        s"doc ${r.getLong(0)}: n/adj_dups/collapsed_n")
    }
  }

  test("q109 deciles equal each source's fully sorted k-th elements") {
    val per = qualityBrute()
    val got = run("q109_source_deciles").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size == per.size * 9, "nine deciles per source, each once")
    per.foreach { case (src, sorted) =>
      (1 to 9).foreach { i =>
        val k = math.ceil(i * sorted.length / 10.0).toInt
        assert(got((src, i)) == sorted(k - 1), s"$src decile $i")
      }
    }
  }

  test("q110 covers exactly the q35 pair set with est in [0, 1]") {
    val jac = run("q35_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = run("q110_minhash_error").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == jac.keySet)
    rows.foreach { r =>
      val (est, err) = (r.getDouble(3), r.getDouble(4))
      assert(est >= 0.0 && est <= 1.0 && est * 8 == math.rint(est * 8),
        s"est must be k/8: $est")
      val expected = BigDecimal(est - jac((r.getLong(0), r.getLong(1))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(err - expected) < 1e-9, s"err mismatch: $err")
    }
  }

  test("q111 lift ranking matches a driver-side brute force") {
    val toks = Tables(spark, sf001, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cst = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ns = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nTot = toks.length.toLong
    val expected = cst.collect {
      case ((s, t), c) if c >= 5 =>
        (s, t, (c * nTot).toDouble / (ns(s) * ct(t)).toDouble)
    }.toSeq.groupBy(_._1).map { case (s, vs) =>
      s -> vs.sortBy(v => (-v._3, v._2)).take(10).map(_._2)
    }
    val got = run("q111_source_overrep").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).map { case (s, vs) =>
        s -> vs.sortBy(_._2).map(_._3).toSeq
      }
    assert(got == expected, "per-source top-10 lift terms")
  }

  test("q112 split report partitions every source's documents") {
    val total = Tables(spark, sf001, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q112_split_assign").collect()
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.keySet == total.keySet)
    bySource.foreach { case (s, vs) =>
      assert(vs.map(_.getLong(2)).sum == total(s),
        s"$s: split sizes must partition the source")
      val fracSum = vs.map(_.getDouble(3)).sum
      assert(math.abs(fracSum - 1.0) < 0.001, s"$s: fractions sum to ~1")
    }
  }

  test("q113 detects the planted aligned run and nothing else") {
    // doc 2 embeds doc 1's 80-token prefix at EXACTLY one stride (24
    // tokens) in: the 32/24 chunking then produces three identical
    // chunk windows (s0-31, s24-55, s48-79) at a constant index
    // offset — one diagonal of length 3. Doc 3 shares nothing.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q113").toString
    val shared = (0 until 80).map(i => s"s$i").mkString(" ")
    Seq(
      (1L, shared + " " + (0 until 10).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 24).map(i => s"b$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"c$i").mkString(" ")),
      (3L, (0 until 90).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q113_aligned_dups")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L)),
      s"expected the planted pair with a 3-chunk aligned run: ${got.toSeq}")
  }

  test("q105 yields NULL pct_rank for a single-document source") {
    // the (rk-1)/(n-1) divide is 0/0 there; Spark would return NULL
    // and DuckDB NaN, so the explicit guard must fire on BOTH engines
    // — this fixture covers the input shape the driver corpus never
    // produces
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q105solo").toString
    Seq(
      (1L, "only doc here", "solo"),
      (2L, "first of three alpha beta", "trio"),
      (3L, "second of three gamma", "trio"),
      (4L, "third of three delta epsilon zeta", "trio"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q105_calibrate")(spark, dir).collect()
    val solo = rows.filter(_.getString(1) == "solo")
    assert(solo.length == 1 && solo.head.isNullAt(3),
      "single-doc source must calibrate to NULL, not 0/0")
    val trio = rows.filter(_.getString(1) == "trio")
      .map(_.getDouble(3)).sorted.toSeq
    assert(trio == Seq(0.0, 0.5, 1.0), s"3-doc source spans [0,1]: $trio")
  }

  /** Per-source quality values, sorted by (quality, doc_id), computed
    * with the same arithmetic as the engine (exact doubles).
    */
  private def qualityBrute(): Map[String, Array[(Double, Long)]] =
    Tables(spark, sf001, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"),
        round(least(lit(1.0), size(col("toks")) / 100.0)
          * (size(array_distinct(col("toks"))) / size(col("toks"))), 6)
          .as("quality"))
      .collect()
      .map(r => (r.getString(1), (r.getDouble(2), r.getLong(0))))
      .groupBy(_._1)
      .map { case (s, vs) => s -> vs.map(_._2).sorted }
}
