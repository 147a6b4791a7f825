package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 second-wave operators (q85–q100)
  * beyond the driver's oracle hash-match: SCD-2 intervals partition
  * each key's timeline, the funnel counts only in-order stage
  * progressions (checked against a driver-side brute force), the
  * global rank is a true permutation, multi-probe ANN dominates
  * single-bucket ANN, the two-phase deciles equal a full sort's, and
  * the curation pipeline applies its reasons in order.
  */
class Round5OpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf001)

  test("q85 SCD-2 intervals partition each (user, attribute) timeline") {
    val rows = run("q85_scd2").collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach {
      case ((u, t), vs) =>
        val sorted = vs.sortBy(_.getInt(2)) // version
        assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length),
          s"($u,$t): consecutive versions")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(5) == b.getLong(4), // a.valid_to == b.valid_from
              s"($u,$t): intervals chain")
          case _ => ()
        }
        assert(sorted.count(_.getBoolean(6)) == 1, s"($u,$t): one current")
        assert(sorted.last.isNullAt(5), s"($u,$t): current is open-ended")
    }
  }

  test("q87 funnel equals a driver-side brute force of ordered stages") {
    val events = Tables(spark, sf001, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      // split into 4h-gap sessions
      val sessions = ordered.foldLeft(List.empty[List[(Long, String, Long, Long)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._3 - cur.head._3 < 14400000000L =>
            (e :: cur) :: rest // cur is reverse-ordered; head = last event
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      def stages(s: List[(Long, String, Long, Long)]): (Boolean, Boolean, Boolean) = {
        val fv = s.collectFirst { case e if e._2 == "view" => e._3 }
        val fc = fv.flatMap(v => s.collectFirst {
          case e if e._2 == "click" && e._3 > v => e._3 })
        val fp = fc.flatMap(c => s.collectFirst {
          case e if e._2 == "purchase" && e._3 > c => e._3 })
        (fv.isDefined, fc.isDefined, fp.isDefined)
      }
      val st = sessions.map(stages)
      u -> (sessions.length.toLong, st.count(_._1).toLong,
        st.count(_._2).toLong, st.count(_._3).toLong)
    }
    val got = run("q87_funnel").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
  }

  test("q88 global rank is the permutation a full sort would produce") {
    val rows = run("q88_global_rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    val byRank = rows.sortBy(_._3)
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1),
          s"rank order violated at ${a._3}")
      case _ => ()
    }
  }

  test("q96 multi-probe top-1 is never worse than q42's single bucket") {
    val single = run("q42_ann_lsh").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val multi = run("q96_multiprobe_lsh").collect()
      .filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(multi.nonEmpty)
    single.foreach { case (q, s) =>
      assert(multi.getOrElse(q, Double.MinValue) >= s,
        s"query $q: multi-probe must dominate")
    }
  }

  test("q99 deciles equal the fully sorted array's k-th elements") {
    val prices = Tables(spark, sf001, "orders")
      .select(col("o_totalprice"), col("o_orderkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sorted
    val got = run("q99_exact_deciles").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    (1 to 9).foreach { i =>
      val k = math.ceil(i * prices.length / 10.0).toLong
      assert(got(i) == prices((k - 1).toInt), s"decile $i")
    }
  }

  test("q99 stays exact when several deciles land in ONE price bucket") {
    // Adversarial shape the bundled data never hits: every price in
    // [0, 1000) → one bucket holds all nine deciles. The targets join
    // then emits nine copies of every bucket row; ranking them in a
    // b-only window would interleave the copies (identical sort keys,
    // arbitrary row_number) and pick wrong rows. The (b, decile)
    // partition must keep each decile's copy intact.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q99bucket").toString
    val rows = (1L to 97L).map(k => (k, (k * 613 % 997).toDouble + 0.25))
    rows.toDF("o_orderkey", "o_totalprice")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q99_exact_deciles")(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.size == 9, "all nine deciles emitted exactly once")
    val sorted = rows.map { case (k, p) => (p, k) }.sorted
    (1 to 9).foreach { i =>
      val k = math.ceil(i * sorted.length / 10.0).toInt
      assert(got(i) == sorted(k - 1), s"decile $i in the shared bucket")
    }
  }

  test("q100 applies reasons in pipeline order") {
    val rows = run("q100_curation_pipeline").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, reason) = (r.getInt(3), r.getBoolean(4), r.getString(5))
      if (n < 40) assert(reason == "quality_short",
        s"doc ${r.getLong(0)}: short docs fail at quality first")
      assert(kept == (reason == "kept"))
    }
    assert(rows.map(_.getString(5)).distinct.length >= 2,
      "the fixture corpus must exercise more than one reason")
  }
}
