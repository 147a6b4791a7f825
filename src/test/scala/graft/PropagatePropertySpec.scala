package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) property test for the
  * pointer-doubling min-label propagation against a brute-force
  * union-find oracle: on ANY undirected edge set, every endpoint must
  * be labeled with the minimum node id of its connected component,
  * within the O(log diameter) round bound.
  *
  * Shapes covered by construction across the seeds: disjoint cliques,
  * chains, stars, rings, self-contained random graphs with isolated
  * pairs — the zoo a crawl's near-dup graph actually produces.
  */
class PropagatePropertySpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // path-compress to the component min (parents always point lower)
    nodes.map(n => n -> find(n)).toMap
  }

  test("propagate equals brute-force union-find on random graphs") {
    import spark.implicits._
    val rnd = new Random(4217)
    for (trial <- 0 until 6) {
      val n = 10 + rnd.nextInt(40)
      val nEdges = 1 + rnd.nextInt(2 * n)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong
        var b = rnd.nextInt(n).toLong
        if (a == b) b = (a + 1) % n
        (math.min(a, b), math.max(a, b))
      }.distinct
      val expect = unionFind(edges)
      val (labels, rounds) = graft.operators.Dedup.propagate(
        edges.toDF("da", "db"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"trial $trial (n=$n, edges=${edges.length})")
      // O(log diameter) bound: diameter < n, so ceil(log2 n) + 2 is a
      // safe envelope for the seed + jump rounds
      val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2
      assert(rounds <= bound, s"trial $trial took $rounds rounds (n=$n)")
    }
  }
}
