package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** q190's hashing-trick scorer: the engine's score must equal an
  * independent JVM re-derivation of the model (bucket = top-60-bit
  * md5 mod 1024, sign from a salted hash, deterministic integer
  * milli-weights), feature-by-feature — the oracle gate proves
  * Spark==DuckDB; this proves both equal the MODEL as specified.
  */
class HashClassifierSpec extends AnyFunSuite {

  // the same 60-bit md5 key Md5Long computes
  private def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def contrib(term: String): Long = {
    val sign = if (md5Long("s#" + term) % 2 == 0) 1L else -1L
    val j = md5Long(term) % 1024
    sign * ((j * 2654435761L) % 2001L - 1000L)
  }

  private def score(text: String): (Long, Long) = {
    val t = text.split(" ", -1)
    val feats = t.toSeq ++ t.sliding(2).filter(_.length == 2)
      .map(_.mkString(" "))
    (feats.size.toLong, feats.map(contrib).sum)
  }

  test("engine scores equal the independent model re-derivation") {
    val spark = SparkSpec.session
    val got = SparkEntry.queries("q190_hash_classifier")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.size === docs.length)
    docs.foreach { case (id, text) =>
      val (nf, sm) = score(text)
      val (gotN, gotS, gotK) = got(id)
      assert(gotN === nf, s"doc $id feature count")
      assert(gotS === sm, s"doc $id score")
      assert(gotK === (sm * 20 > nf), s"doc $id keep flag")
    }
    // the threshold actually separates: both classes populated
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "fixture corpus should land docs on both sides of the threshold")
  }

  test("the inference plan has ZERO exchanges (map-only scoring)") {
    val spark = SparkSpec.session
    val plan = SparkEntry.queries("q190_hash_classifier")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      "hashing-trick inference must not shuffle — the whole score is " +
        "computed inside one map stage")
  }

  test("broadcast-table serving (q193) equals fused-arithmetic serving (q190)") {
    val spark = SparkSpec.session
    val a = SparkEntry.queries("q190_hash_classifier")(
      spark, "/root/testdata/sf0.001")
    val b = SparkEntry.queries("q193_classifier_broadcast")(
      spark, "/root/testdata/sf0.001")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "the two serving paths must compute the same model")
    // the weight side broadcasts; the corpus pays one exchange (the
    // per-doc aggregation), nothing else. AQE off so the physical
    // tree is inspectable (the SpanIngestSpec precedent).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q193_classifier_broadcast")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.nonEmpty, "weights must join as a broadcast")
      // the input-split round-robin (Tables.parallel's single-file
      // emulation — a passthrough on properly split production
      // tables) is not part of the scoring algorithm; the pin is
      // about the HASH exchanges the algorithm pays
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if !e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
                .RoundRobinPartitioning] => e
      }
      assert(shuffles.size <= 1,
        s"expected at most the doc_id agg exchange, got ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
