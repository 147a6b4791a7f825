package graft

import org.apache.spark.sql.functions._

/** Pins for the native winnowing expression
  * ([[graft.functions.WinnowFps]]) beyond the q39/q95 oracle gates:
  *
  *  - the O(1)-per-position ROLLING recurrence equals the direct
  *    per-position polynomial (the form the DuckDB oracle replays),
  *    window-min/distinct semantics included, over random strings —
  *    the algebraic identity the whole cross-engine contract rests on;
  *  - the winnowing guarantee: documents sharing ≥ k + w − 1 = 11
  *    consecutive characters share a fingerprint;
  *  - the output contract (sorted ascending, distinct, empty below
  *    the window threshold, null-propagating).
  */
class WinnowFpsSpec extends SparkSpec {

  import graft.functions.WinnowFps

  /** The direct-polynomial reference, spelled entirely in Spark HOFs
    * over CHARACTER positions — an independent evaluation path (no
    * shared code with the rolling implementation, interpreted HOF
    * lambdas vs the native one-pass loop) mirroring the oracle SQL
    * shape: per-position fold, window-min via slice, distinct, sort.
    */
  private val referenceExpr =
    "array_sort(array_distinct(transform(sequence(1, size(khs) - 3), " +
      "j -> array_min(slice(khs, j, 4)))))"
  private val khsExpr =
    "transform(sequence(1, length(text) - 7), i -> " +
      "aggregate(sequence(0, 7), 0L, (acc, j) -> " +
      "(acc * 257 + ascii(substring(text, i + j, 1))) % 2147483647) " +
      "* 2147483648L + " +
      "aggregate(sequence(0, 7), 0L, (acc, j) -> " +
      "(acc * 263 + ascii(substring(text, i + j, 1))) % 2147483647))"

  test("rolling hash equals the direct polynomial the oracle replays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // printable ASCII incl. repeats-heavy small alphabets (the
    // adversarial case for window-min ties and adjacent-dup skipping)
    val strs = (1 to 200).map { i =>
      val alpha = if (i % 3 == 0) "ab " else
        "abcdefghijklmnopqrstuvwxyz0123456789 .,!?"
      val n = 11 + rnd.nextInt(300)
      (i.toLong, (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val df = strs.toDF("id", "text").localCheckpoint(true)
    graft.functions.WinnowFps.register(spark)
    val bad = df
      .select(col("id"), expr("winnow_fps(text)").as("native"),
        expr(khsExpr).as("khs"))
      .select(col("id"), col("native"), expr(referenceExpr).as("ref"))
      .filter(not(col("native") === col("ref")))
      .count()
    assert(bad === 0L,
      "native rolling winnow must equal the direct-polynomial reference")
  }

  test("shared 11-char run guarantees a shared fingerprint") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randStr(11)
    val pairs = (1 to 50).map { i =>
      (i.toLong, randStr(rnd.nextInt(60)) + shared + randStr(rnd.nextInt(60)))
    }
    graft.functions.WinnowFps.register(spark)
    val fpSets = pairs.toDF("id", "text")
      .select(col("id"), expr("winnow_fps(text)").as("fps"))
      .collect().map(_.getSeq[Long](1).toSet)
    val common = fpSets.reduce(_ intersect _)
    assert(common.nonEmpty,
      "every doc embedding the same 11-char run must share a fingerprint")
  }

  test("output contract: sorted distinct, empty under threshold, null-safe") {
    import spark.implicits._
    graft.functions.WinnowFps.register(spark)
    val rows = Seq(
      (1L, Option("0123456789")),       // 10 chars: below k + w - 1
      (2L, Option("0123456789a")),      // exactly 11: one window
      (3L, Option("aaaaaaaaaaaaaaaa")), // all-equal hashes: one fp
      (4L, None: Option[String]))
      .toDF("id", "text")
      .select(col("id"), expr("winnow_fps(text)").as("fps"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Long](1).isEmpty)
    assert(rows(1).getSeq[Long](1).size === 1)
    assert(rows(2).getSeq[Long](1).size === 1,
      "a uniform string has exactly one distinct k-gram hash")
    assert(rows(3).isNullAt(1), "null input propagates null")
    // sortedness on a real string
    val fps = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
      .select(expr("winnow_fps(text)").as("fps"))
      .head().getSeq[Long](0)
    assert(fps === fps.sorted && fps.distinct === fps,
      "fingerprints are sorted ascending and distinct")
    assert(fps.forall(_ >= 0), "combined 62-bit fingerprints are non-negative")
  }

  test("constants agree with the oracle spelling") {
    // the SQL literals baked into the q39/q95 oracles
    assert(WinnowFps.M === 2147483647L)
    assert(WinnowFps.TWO31 === 2147483648L)
    assert(WinnowFps.B1 === 257L && WinnowFps.B2 === 263L)
    assert(WinnowFps.K === 8 && WinnowFps.W === 4)
    // rolling subtraction coefficients are B^(K-1) mod M
    assert(WinnowFps.B1K === BigInt(257).modPow(7, BigInt(WinnowFps.M)).toLong)
    assert(WinnowFps.B2K === BigInt(263).modPow(7, BigInt(WinnowFps.M)).toLong)
  }
}
