package graft

import java.nio.file.Files

import graft.functions.{Md5Long, MinHashSignature}
import graft.operators.Multimodal
import graft.streaming.CrawlIngest
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Property test for the near-dup crawl seam (q206's induction on
  * RANDOM crawl shapes — the WebCurationPropertySpec precedent): a
  * sequential JVM reference re-implements the exact semantics —
  * per-wave LSH banding (the same md5/minhash arithmetic via
  * [[Md5Long.hash]] and [[MinHashSignature]]'s coefficients),
  * within-wave union-find closure, min-stored-label merge, labels as
  * assigned at each record's OWN wave — and every engine run through
  * real DeltaStore tables must match it record for record. Random
  * shapes cover what the fixed fixture cannot: sub-3-token docs (no
  * bands → self-label), within-wave twin chains, cross-wave near-dup
  * chains through a mutated token, and random wave splits of the
  * duplicate structure.
  */
class WetNearPropertySpec extends SparkSpec {

  private val P = MinHashSignature.P

  /** The reference banding: bit-equal to [[graft.operators.Dedup
    * .bandSignatures]] (3-gram shingles, md5long % P, 8 multiply-add
    * minhashes, 4 bands × 2 rows).
    */
  private def bandsOf(text: String): Seq[(Int, Long, Long)] = {
    val t = text.split(" ")
    if (t.length < 3) return Nil
    val hbs = (0 to t.length - 3).map { i =>
      Md5Long.hash(UTF8String.fromString(
        t.slice(i, i + 3).mkString(" "))) % P
    }
    val mh = (0 to 7).map(k =>
      hbs.map(hb => (MinHashSignature.A(k) * hb + MinHashSignature.B(k)) % P)
        .min)
    (0 to 3).map(b => (b, mh(2 * b), mh(2 * b + 1)))
  }

  /** Sequential replay of the seam's induction. Input: records as
    * (wave, ck, text) in wave order. Output: ck → (near_comp,
    * near_dup_of_store).
    */
  private def reference(
      recs: Seq[(Int, Long, String)]): Map[Long, (Long, Boolean)] = {
    val storeBands =
      scala.collection.mutable.Map[(Int, Long, Long), List[Long]]()
    val labels = scala.collection.mutable.Map[Long, Long]()
    val out = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    for (w <- recs.map(_._1).distinct.sorted) {
      val wave = recs.filter(_._1 == w)
      val waveBands = wave.map { case (_, ck, t) => ck -> bandsOf(t) }.toMap
      // per-record min stored label over band matches
      val scand: Map[Long, Option[Long]] = wave.map { case (_, ck, _) =>
        val matched = waveBands(ck)
          .flatMap(b => storeBands.getOrElse(b, Nil)).distinct
        ck -> (if (matched.isEmpty) None else Some(matched.map(labels).min))
      }.toMap
      // within-wave closure: union-find over shared band triples
      val parent = scala.collection.mutable.Map(
        wave.map(r => r._2 -> r._2): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      for {
        Seq((_, a, _), (_, b, _)) <- wave.combinations(2)
        if waveBands(a).toSet.intersect(waveBands(b).toSet).nonEmpty
      } parent(find(a)) = find(b)
      // per batch component: min store label, else min member ck
      wave.groupBy(r => find(r._2)).foreach { case (_, members) =>
        val cks = members.map(_._2)
        val sc = cks.flatMap(scand(_))
        val fin = if (sc.nonEmpty) sc.min else cks.min
        cks.foreach { ck =>
          labels(ck) = fin
          out(ck) = (fin, sc.nonEmpty)
        }
      }
      // fold the wave's bands in
      wave.foreach { case (_, ck, _) =>
        waveBands(ck).foreach(b =>
          storeBands(b) = ck :: storeBands.getOrElse(b, Nil))
      }
    }
    out.toMap
  }

  test("engine near assignment == sequential reference on random crawl shapes") {
    import spark.implicits._
    val wordsOf = (rnd: scala.util.Random, n: Int) =>
      (0 until n).map(_ => s"w${rnd.nextInt(400)}").mkString(" ")
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 7919)
      val nWaves = 2 + rnd.nextInt(2)
      // base pool with planted structure
      val pool = scala.collection.mutable.ArrayBuffer[String]()
      (0 until 12 + rnd.nextInt(10)).foreach { _ =>
        val t = wordsOf(rnd, 8 + rnd.nextInt(30))
        pool += t
        if (rnd.nextInt(3) == 0) pool += t // exact dup
        if (rnd.nextInt(3) == 0) { // near dup: one token mutated
          val w = t.split(" "); w(rnd.nextInt(w.length)) = "zz9"
          pool += w.mkString(" ")
        }
        if (rnd.nextInt(5) == 0) pool += wordsOf(rnd, 1 + rnd.nextInt(2)) // short
      }
      val docs = rnd.shuffle(pool.toSeq)
      // assign to waves (a wave may be empty of docs — it still folds)
      val byWave = docs.zipWithIndex
        .groupBy { case (_, i) => i % nWaves }.toSeq.sortBy(_._1)
      val recs = byWave.flatMap { case (w, ds) =>
        ds.zipWithIndex.map { case ((t, _), i) =>
          (w, w.toLong * 1000000L + i, t)
        }
      }
      val want = reference(recs)

      val tag = s"wnp$seed"
      Seq(s"${tag}_fps", s"${tag}_hosts", s"${tag}_bands", s"${tag}_comps")
        .foreach { t =>
          Seq(t, t + "_wm").foreach { n =>
            spark.sql(s"DROP TABLE IF EXISTS $n")
            val p = new org.apache.hadoop.fs.Path(
              spark.conf.get("spark.sql.warehouse.dir"), n)
            p.getFileSystem(spark.sessionState.newHadoopConf())
              .delete(p, true)
          }
        }
      CrawlIngest.writeFpStoreEmpty(spark, s"${tag}_fps", 4)
      CrawlIngest.writeHostStore(spark, s"${tag}_hosts", 4)
      CrawlIngest.writeNearStoresEmpty(spark, s"${tag}_bands",
        s"${tag}_comps", 4)
      val near = Some((s"${tag}_bands", s"${tag}_comps"))
      val got = scala.collection.mutable.Map[Long, (Long, Boolean)]()
      byWave.foreach { case (w, ds) =>
        val payload = ds.zipWithIndex.toArray.flatMap { case ((t, _), i) =>
          Multimodal.gzipBytes(
            (s"https://h${i % 3}.example.org/p$i\r\n\r\n" + t)
              .getBytes("UTF-8"))
        }
        val files = Seq((w.toLong, payload)).toDF("file_id", "payload")
        val v = CrawlIngest.wetVerdicts(spark, files, s"${tag}_fps",
          s"${tag}_hosts", 1000000, w + 1L, None, near).localCheckpoint()
        assert(CrawlIngest.foldWet(spark, v, s"${tag}_fps",
          s"${tag}_hosts", w + 1L, near), s"seed $seed wave $w must fold")
        v.select(col("file_id"), col("rec_idx"), col("near_comp"),
          col("near_dup_of_store")).collect().foreach { r =>
            got(r.getLong(0) * 1000000L + r.getLong(1)) =
              (r.getLong(2), r.getBoolean(3))
          }
      }
      assert(got.toMap === want,
        s"seed $seed: engine labels must equal the sequential reference " +
          s"(waves=$nWaves, docs=${docs.size})")
    }
  }
}
