package graft

import scala.util.Random

import graft.operators.WebCuration
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) property test for q203's
  * verdict chain against a sequential reference: on ANY crawl shape —
  * re-fetches of one URL with identical or changed bodies, two URLs
  * mirroring one body (cross-page duplicates), hosts far over and far
  * under the cap, blocked hosts, sub-floor quality — the distributed
  * chain (url-keyed latest agg → fp-keyed canonical agg → group-
  * limited cap window) must produce the exact flag set a
  * single-threaded pass computes, and must be invariant under input
  * partitioning.
  *
  * The deliberately nasty interactions the seeds cover: a canonical
  * copy whose OTHER mirror is the latest fetch of its own URL (both
  * latest, one canonical), a body whose only canonical candidate is
  * superseded by a re-fetch (old version's fp vanishes from the
  * latest set), and cap competition decided by the (quality, file,
  * rec) tie-break among equal-quality records.
  */
class WebCurationPropertySpec extends SparkSpec {

  private val Cap = 3
  private val Floor = 0.3

  private case class Rec(fileId: Long, recIdx: Long, url: String,
      host: String, body: String, quality: Double)

  /** Sequential reference for [[WebCuration.webVerdicts]]. */
  private def reference(recs: Seq[Rec], blocklist: Set[String])
      : Map[(Long, Long), (Boolean, Boolean, Boolean, Boolean)] = {
    def ck(r: Rec) = r.fileId * 1000000L + r.recIdx
    val latest = recs.groupBy(_.url).view
      .mapValues(_.map(ck).max).toMap
    def isLatest(r: Rec) = ck(r) == latest(r.url)
    val canon = recs.filter(isLatest).groupBy(_.body).view
      .mapValues(_.map(ck).min).toMap
    def isCanon(r: Rec) = isLatest(r) && ck(r) == canon(r.body)
    def blocked(r: Rec) = blocklist.contains(r.host)
    val eligible = recs.filter(r =>
      isLatest(r) && isCanon(r) && !blocked(r) && r.quality >= Floor)
    val kept = eligible.groupBy(_.host).values.flatMap { hs =>
      hs.sortBy(r => (-r.quality, r.fileId, r.recIdx)).take(Cap)
    }.map(r => (r.fileId, r.recIdx)).toSet
    recs.map(r => (r.fileId, r.recIdx) ->
      ((isLatest(r), isCanon(r), blocked(r),
        kept.contains((r.fileId, r.recIdx))))).toMap
  }

  private def corpus(seed: Int): Seq[Rec] = {
    val rnd = new Random(seed)
    val hosts = (0 until 2 + rnd.nextInt(4)).map(h => s"h$h.example.org")
    // a small body pool forces cross-URL mirrors and re-fetch
    // identities; quality derives from the body so mirrors tie
    val bodies = (0 until 3 + rnd.nextInt(6)).map(b =>
      (0 until 5 + rnd.nextInt(120))
        .map(w => s"w${rnd.nextInt(40)}").mkString(" "))
    val urls = hosts.flatMap(h =>
      (0 until 1 + rnd.nextInt(3)).map(p => s"https://$h/p$p"))
    val n = 10 + rnd.nextInt(40)
    (0 until n).map { i =>
      val url = urls(rnd.nextInt(urls.size))
      Rec(i.toLong / 5L, i.toLong % 5L, url,
        url.stripPrefix("https://").takeWhile(_ != '/'),
        bodies(rnd.nextInt(bodies.size)), 0.0)
    }.map { r =>
      val toks = r.body.split(" ")
      r.copy(quality = BigDecimal(
        math.min(1.0, toks.length / 100.0)
          * (toks.distinct.length.toDouble / toks.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q203 chain == sequential reference on random crawls; partition-invariant") {
    import spark.implicits._
    for (seed <- 1 to 12) {
      val recs = corpus(seed)
      val blocklist = Set(recs.head.host) // first host always blocked
      val df = recs
        .map(r => (r.fileId, r.recIdx, r.url, r.host, r.body, r.quality))
        .toDF("file_id", "rec_idx", "url", "host", "body", "quality")
      def run(parts: Int) = WebCuration
        .webVerdicts(df.repartition(parts), Cap, blocklist.toSeq)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
            r.getBoolean(7)))).toMap
      val got = run(7)
      assert(got === reference(recs, blocklist), s"seed $seed")
      assert(got === run(1), s"seed $seed: partitioning must not matter")
      val keptPerHost = got.collect { case ((f, r), (_, _, _, true)) =>
        recs.find(x => x.fileId == f && x.recIdx == r).get.host }
        .groupBy(identity).view.mapValues(_.size)
      assert(keptPerHost.values.forall(_ <= Cap),
        s"seed $seed: cap exceeded: $keptPerHost")
      assert(!keptPerHost.keySet.exists(blocklist),
        s"seed $seed: blocked host kept")
    }
  }
}
