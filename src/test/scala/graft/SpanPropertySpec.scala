package graft

import scala.util.Random

import graft.operators.Dedup

/** Randomized (seeded, deterministic) property test for q164's
  * duplicated-span coverage against a sequential reference: on ANY
  * corpus, the distributed mark-and-merge (gram df gate → window
  * island detection → per-doc union length) must equal what a
  * single-threaded interval union computes. This is the property
  * that makes the two-window island encoding trustworthy — adjacent
  * vs overlapping vs nested marks, multiple islands per doc, and
  * within-doc repeated grams (one mark per POSITION, df counted per
  * distinct DOC) are exactly where a hand-rolled union goes wrong.
  *
  * Shapes covered across the seeds: tiny vocabularies (dense gram
  * collisions), verbatim doc clones, docs shorter than one gram,
  * self-repeating docs whose grams repeat only intra-doc (df = 1 ⇒
  * zero coverage), and sparse corpora with no duplication at all.
  */
class SpanPropertySpec extends SparkSpec {

  private val K = 8

  /** Sequential reference: mark every position whose 8-gram occurs in
    * ≥ 2 distinct docs, union the [i, i+7] intervals per doc.
    */
  private def reference(docs: Map[Long, Vector[String]]): Map[Long, Long] = {
    val df = docs.toSeq
      .flatMap { case (id, t) =>
        t.sliding(K).filter(_.size == K).map(g => (g.mkString(" "), id)) }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    docs.map { case (id, t) =>
      val marks = t.sliding(K).zipWithIndex.collect {
        case (g, i) if g.size == K && df(g.mkString(" ")) >= 2 =>
          (i + 1, i + K) // 1-based [start, end]
      }.toSeq
      var covered = 0L
      var curA = -1; var curB = -2
      marks.foreach { case (a, b) =>
        if (a > curB) { // disjoint: flush
          if (curB >= curA) covered += curB - curA + 1
          curA = a; curB = b
        } else curB = math.max(curB, b)
      }
      if (curB >= curA) covered += curB - curA + 1
      id -> covered
    }
  }

  test("distributed span coverage equals the sequential interval union") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47, 91)) {
      val rnd = new Random(seed)
      val vocab = (0 until (2 + rnd.nextInt(4))).map(i => s"t$i")
      val base = (0L until (12 + rnd.nextInt(10))).map { id =>
        val n = rnd.nextInt(30) // includes < K-token docs
        id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      }.toMap
      // planted shapes: a verbatim clone pair and a self-repeating doc
      // whose grams never leave it (df = 1 ⇒ zero coverage)
      val clone = base(0L)
      val selfRep = Vector.fill(3)(Vector.tabulate(K)(i => s"u$i")).flatten
      val docs = base + (900L -> clone) + (901L -> selfRep)

      val want = reference(docs)
      val got = Dedup.spanCoverage(
        docs.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
          .toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"seed $seed: coverage mismatch")
      if (clone.size >= K)
        assert(got(900L) === clone.size.toLong, s"seed $seed: clone fully covered")
      assert(got(901L) === 0L,
        s"seed $seed: intra-doc repeats alone must not mark (df is per doc)")
    }
  }
}
