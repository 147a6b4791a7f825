package graft

import graft.operators.{Multimodal, WebCuration}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q198–q201 unit edges beyond the oracle gate: the first-CRLFCRLF
  * header split, exactness of the two-phase per-host cap against the
  * naive single-window rank on a skewed frame, and revisit keeper
  * determinism.
  */
class WebCurationSpec extends SparkSpec {

  private def framedOf(members: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    members.toDF("file_id", "rec_idx", "s")
      .select(col("file_id"), col("rec_idx"),
        expr("encode(s, 'UTF-8')").as("raw"))
  }

  test("header split is first-CRLFCRLF: CRLF line breaks in the body survive") {
    val body = "line one\r\nline two\r\n\r\ntrailing para"
    val rows = WebCuration.parseWet(framedOf(Seq(
      (0L, 0L, s"https://a.example.org/p1\r\n\r\n$body"),
      (0L, 1L, "https://b.example.org/p2\r\n\r\nplain body"))))
      .select(col("rec_idx"), col("url"), col("host"), col("path"),
        col("body"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) === "https://a.example.org/p1")
    assert(rows(0).getString(2) === "a.example.org")
    assert(rows(0).getString(3) === "/p1")
    assert(rows(0).getString(4) === body,
      "a CRLF inside the body must not shift the split point")
    assert(rows(1).getString(4) === "plain body")
  }

  test("host cap: exact top-15 on a skewed frame; partial WindowGroupLimit inferred") {
    import spark.implicits._
    // one mega-host (900 rows) + two small ones, quality ties included
    val recs = ((0 until 900).map(i =>
      (i.toLong / 30L, i.toLong % 30L, "mega.example.org",
        (i % 7).toDouble / 10.0)) ++
      (0 until 8).map(i => (100L + i, 0L, "small.example.org", 0.5)) ++
      (0 until 20).map(i => (200L + i, 0L, "mid.example.org",
        (i % 3).toDouble / 10.0)))
      .toDF("file_id", "rec_idx", "host", "quality")
    val capped = WebCuration.capKeepSet(recs, 15)
    val got = capped
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("host"))
      .orderBy(col("quality").desc, col("file_id"), col("rec_idx"))
    val want = recs.withColumn("rk", row_number().over(w))
      .collect().filter(_.getAs[Int]("rk") <= 15)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.count { case (f, _) => f < 100L } === 15,
      "the mega-host must be capped at exactly 15")
    assert(want.count { case (f, _) => f >= 100L && f < 200L } === 8,
      "an under-cap host keeps everything")
    // the scale guard: Catalyst must rewrite the rank filter into a
    // PARTIAL WindowGroupLimit below the host exchange (each map task
    // ships ≤ cap rows per host) — if this inference ever regresses,
    // hostRanks needs an explicit salt-local pre-rank again
    val plan = capped.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$plan")
    assert(plan.contains("Partial"),
      s"expected the PARTIAL (map-side) group limit:\n$plan")
  }

  test("revisit keeper is the latest fetch and survives record order") {
    import spark.implicits._
    // three fetches of one URL across files, two of another
    val members = Seq(
      (0L, 0L, "https://a.example.org/p1\r\n\r\nversion one"),
      (0L, 1L, "https://a.example.org/p2\r\n\r\nother page"),
      (1L, 0L, "https://a.example.org/p1\r\n\r\nversion two"),
      (2L, 0L, "https://a.example.org/p1\r\n\r\nversion two"),
      (2L, 1L, "https://a.example.org/p2\r\n\r\nother page v2"))
    val recs = WebCuration.parseWet(framedOf(members))
      .select(col("file_id"), col("rec_idx"), col("url"),
        md5(col("body")).as("body_md5"))
    val pages = recs.groupBy(col("url"))
      .agg(max(struct(col("file_id"), col("rec_idx"))).as("latest"),
        count(lit(1)).as("n_fetches"),
        countDistinct(col("body_md5")).as("n_versions"))
      .collect().map(r => r.getString(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)),
          r.getLong(2), r.getLong(3))).toMap
    assert(pages("https://a.example.org/p1") === (((2L, 0L), 3L, 2L)),
      "p1: latest fetch (2,0), 3 fetches, 2 distinct versions")
    assert(pages("https://a.example.org/p2") === (((2L, 1L), 2L, 2L)))
  }

  test("rule resolution: genuine (prefix_len, specificity) tie resolves permissively") {
    import spark.implicits._
    // two host-specific rules, SAME host, SAME prefix length, opposite
    // verdicts — the documented tie rule says allow wins (struct max
    // on the trailing boolean); plus the ordinary precedence cases so
    // the tie fix can't silently regress them
    val rules = Seq(
      ("a.example.org", "/pX", false), // ties with the next on (4, true)
      ("a.example.org", "/pX", true),
      ("*", "/pX", false),             // shorter precedence arm: loses to host-specific
      ("b.example.org", "/q", false)).toDF("r_host", "prefix", "allow")
    val recs = Seq(
      (0L, 0L, "a.example.org", "/pX1"), // tie case → allow
      (0L, 1L, "b.example.org", "/q9"),  // plain deny
      (0L, 2L, "c.example.org", "/zz"))  // no match → null m
      .toDF("file_id", "rec_idx", "host", "path")
    val got = WebCuration.resolveRules(recs, rules)
      .select(col("rec_idx"), col("m.plen"), col("m.allow"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(0L) === ((Some(3), Some(true))),
      "exact tie on (prefix_len, host-specificity) must resolve to allow")
    assert(got(1L) === ((Some(2), Some(false))))
    assert(got(2L) === ((None, None)),
      "a record matching no rule returns the null struct for the caller's default")
  }

  test("clf dual-path gate: fused seam scores equal the broadcast-table serving path") {
    // moved OUT of q207's query path (round-13 verdict item 4: the
    // dual-path count was a permanent driver-blocking gate that ran
    // the classifier twice over the corpus inside a declared query) —
    // the invariant is unchanged: the zero-exchange aggregate() riding
    // the decode scan computes the SAME integer score as the q193
    // broadcast-weight-table shape a trained model ships in, record
    // for record, so trained weights drop into either path
    import graft.operators.{TrainPrep, WebCuration}
    val recs = WebCuration.wetRecords(spark, sf001)
    val fused = TrainPrep.withClfScore(recs, "body")
      .select(col("file_id"), col("rec_idx"),
        col("n_feat"), col("clf_score"))
    val served = TrainPrep.clfScoreBroadcast(recs, "body",
      Seq("file_id", "rec_idx"))
      .select(col("file_id"), col("rec_idx"),
        col("n_feat").as("s_feat"), col("clf_score").as("s_score"))
    val joined = fused.join(served, Seq("file_id", "rec_idx"), "full")
    assert(joined.filter(col("clf_score").isNull ||
      col("s_score").isNull).count() === 0L,
      "both paths must score exactly the same record set")
    assert(joined.filter(col("clf_score") =!= col("s_score") ||
      col("n_feat") =!= col("s_feat")).count() === 0L,
      "fused seam scores must equal the broadcast-table serving path")
  }

  test("wet fixture framing: every doc recovered, URL page-keyed") {
    val recs = WebCuration.wetRecords(spark, sf001)
    assert(recs.count() === Tables(spark, sf001, "documents").count())
    val badUrl = recs.filter(
      !col("url").rlike("^https://src[0-9]+\\.example\\.org/p[0-9]+$"))
    assert(badUrl.count() === 0L)
    // quality arithmetic on the body matches q32 on the plain corpus
    val q32 = SparkEntry.queries("q32_quality")(spark, sf001)
      .agg(sum(col("quality"))).collect()(0).getDouble(0)
    val got = recs.agg(sum(col("quality"))).collect()(0).getDouble(0)
    assert(math.abs(q32 - got) < 1e-9,
      "body quality must equal plain-corpus quality (header excluded)")
  }
}
