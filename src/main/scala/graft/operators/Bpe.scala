package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — tokenizer *training* as an engine
  * operator (q63 covers BPE pre-tokenization, i.e. applying a learned
  * vocab; this learns the merges themselves).
  *
  * The 100 TB shape is the classic two-tier decomposition every
  * production BPE trainer uses: ONE corpus pass collapses the corpus
  * to a `(word, count)` vocabulary frame (Heaps' law: the vocabulary
  * is orders of magnitude smaller than the corpus — ~10⁸ rows where
  * the corpus is 10¹² tokens), and every merge iteration after that
  * touches only the vocabulary. Per iteration: a vocabulary-scale
  * adjacent-pair aggregation → a 1-row global argmax (broadcast back,
  * the engine's scalar-broadcast idiom — never `.collect()`) → a
  * row-local `replace` that applies the merge. K merges = K
  * vocabulary passes, ZERO additional corpus passes.
  *
  * Symbol sequences are carried as marker-delimited strings
  * (`"abc"` → `"~~a~~b~~c~~"`, boundary `~~` around every symbol;
  * `~` cannot occur in the corpus alphabet). A merge of (a, b)
  * is then the literal string replace
  * `"~a~~b~"` → `"~ab~"`: the pattern takes only the *inner* half of
  * each outer boundary, so two adjacent occurrences do not overlap
  * and left-to-right non-overlapping `replace` reproduces exactly
  * BPE's greedy merge-all scan (`"aaaa"` → `["aa","aa"]`, not
  * `["aa","a","a"]`) — and the surviving outer `~` on each side makes
  * a partial-symbol match impossible (`"za"` can never match a
  * pattern anchored at `~a`). Identical semantics in Spark's
  * `replace` and DuckDB's, so the oracle reproduces the learned
  * merges bit-for-bit, argmax tie-break included
  * (count DESC, then (lsym, rsym) ascending — deterministic across
  * engines, runs, and retries).
  *
  * (The reference — nambrot/biometric-stream-processing — has no text
  * pipeline; this is the extended training-data surface the build
  * brief demands.)
  */
object Bpe {

  /** Corpus → checkpointed `(s, c)` vocabulary frame: one exchange on
    * the word, then the marker-string representation is a row-local
    * projection. `localCheckpoint` materializes it so the K merge
    * iterations (and the K union branches of the merge report) never
    * re-derive the corpus pass; a production run would persist this
    * frame as a table instead (reliable under executor loss, and
    * reusable across trainer configurations).
    */
  private def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(col("w"),
        concat(regexp_replace(col("w"), "(.)", "~~$1"), lit("~~")).as("s"),
        col("c"))
      .localCheckpoint()

  /** Weighted adjacent-pair counts over the vocabulary frame: split
    * the marker string back into symbols, explode adjacent pairs
    * (single-symbol words contribute none), sum word counts per pair.
    * One vocabulary-scale exchange on (lsym, rsym) with partial
    * aggregation — the frame entering the exchange is already
    * pair-distinct per task.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("y",
        expr("slice(split(s, '~~'), 2, size(split(s, '~~')) - 2)"))
      .filter(size(col("y")) >= 2)
      .select(col("c"), explode(expr(
        """transform(sequence(1, size(y) - 1),
          |  j -> struct(element_at(y, j) as lsym, element_at(y, j + 1) as rsym))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.lsym").as("lsym"), col("p.rsym").as("rsym"))
      .agg(sum(col("c")).as("cnt"))

  /** Learn `k` merges; returns one row per iteration
    * (iter, lsym, rsym, cnt). The global argmax is a 1-row
    * `min(struct(-cnt, lsym, rsym))` aggregate — partial-aggregated
    * to one row per task, so the "pick the best pair" step shuffles
    * |tasks| rows, not the pair table. Each iteration's merged
    * vocabulary is checkpointed: iteration i+1's plan starts from a
    * materialized frame instead of re-deriving merges 1..i (keeps
    * total work K vocabulary passes, not K²/2).
    */
  def merges(s: SparkSession, d: String, k: Int): DataFrame =
    mergesOf(Tables.parallel(s, d, "documents"), k)

  /** Same, over any frame with a `text` column — the property-test
    * surface (BpePropertySpec runs it against a sequential reference
    * implementation on generated corpora).
    */
  def mergesOf(docs: DataFrame, k: Int): DataFrame = learn(docs, k)._1

  /** The vocabulary AFTER k learned merges — (w, s, c) with `s` the
    * merged marker string. This is the tokenizer-application surface:
    * encoding the corpus with a learned vocab is a vocabulary-sized
    * join, never a corpus rewrite (see q162).
    */
  def mergedVocab(docs: DataFrame, k: Int): DataFrame = learn(docs, k)._2

  /** The k-iteration learn loop shared by the merge report and the
    * encoder: returns (merge report, final vocabulary).
    */
  private def learn(docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    var words = vocab(docs)
    val bests = (1 to k).map { i =>
      val best = pairCounts(words)
        .agg(min(struct((-col("cnt")).as("nc"), col("lsym"), col("rsym")))
          .as("b"))
        .select(col("b.lsym").as("lsym"), col("b.rsym").as("rsym"),
          (-col("b.nc")).as("cnt"))
      // null-safe apply: once merges exhaust (empty pair aggregate →
      // null argmax) the vocabulary must pass through unchanged, not
      // collapse to null strings
      words = words.crossJoin(broadcast(best))
        .withColumn("s", expr(
          """case when lsym is null then s
            |     else replace(s, concat('~', lsym, '~~', rsym, '~'),
            |                     concat('~', lsym, rsym, '~')) end""".stripMargin))
        .select(col("w"), col("s"), col("c"))
        .localCheckpoint()
      best.withColumn("iter", lit(i))
    }
    val report = bests.reduce(_ unionByName _)
      // exhaustion guard: a corpus can run out of adjacent pairs
      // before k merges (every word one symbol) — the empty aggregate
      // then yields a null-struct argmax. Dropping those rows makes
      // "stop when exhausted" the semantics on both engines (the
      // oracle's LIMIT 1 over an empty pair table produces no row).
      .filter(col("lsym").isNotNull)
      .select(col("iter"), col("lsym"), col("rsym"), col("cnt"))
    (report, words)
  }

  /** The DuckDB oracle unrolls the same k iterations as chained CTEs —
    * mechanical generation, same representation, same `replace`
    * semantics, same ORDER BY cnt DESC, lsym, rsym LIMIT 1 tie-break.
    */
  /** The k-iteration CTE chain (base word counts → p_i/b_i/w_i),
    * carrying the word spelling through every w_i so both the merge
    * report and the encoder rollup hang off the same chain. (The
    * cross join against b_i assumes no exhaustion — true of the test
    * corpus at every sf; the Spark side's null-safe apply is the
    * general-corpus behavior BpePropertySpec covers.)
    */
  private def chainSql(k: Int): String = {
    val base =
      """wc AS (SELECT w, count(*) AS c
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |       WHERE len(w) > 0 GROUP BY w),
        |w0 AS (SELECT w, regexp_replace(w, '(.)', '~~\1', 'g') || '~~' AS s, c FROM wc)"""
        .stripMargin
    val iters = (1 to k).map { i =>
      s"""p$i AS (SELECT y[j] AS lsym, y[j + 1] AS rsym, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT c, sy[2:len(sy) - 1] AS y
         |        FROM (SELECT c, string_split(s, '~~') AS sy FROM w${i - 1})) t,
         |       UNNEST(generate_series(1, len(y) - 1)) AS g(j)
         |  WHERE len(y) >= 2 GROUP BY 1, 2),
         |b$i AS (SELECT lsym, rsym, cnt FROM p$i ORDER BY cnt DESC, lsym, rsym LIMIT 1),
         |w$i AS (SELECT w, replace(s, '~' || lsym || '~~' || rsym || '~',
         |                       '~' || lsym || rsym || '~') AS s, c
         |        FROM w${i - 1}, b$i)""".stripMargin
    }
    s"$base,\n${iters.mkString(",\n")}"
  }

  private def mergesOracle(k: Int): String = {
    val sel = (1 to k)
      .map(i => s"SELECT $i AS iter, lsym, rsym, cnt FROM b$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${chainSql(k)}\n$sel"
  }

  private def encodeOracle(k: Int): String =
    s"""WITH ${chainSql(k)},
       |wcs AS (SELECT source, w, count(*) AS c
       |        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
       |              FROM documents)
       |        WHERE len(w) > 0 GROUP BY 1, 2),
       |vf AS (SELECT w, CAST(len(string_split(s, '~~')) - 2 AS BIGINT) AS n_syms
       |       FROM w$k)
       |SELECT source,
       |  CAST(sum(c) AS BIGINT) AS n_words,
       |  CAST(sum(len(w) * c) AS BIGINT) AS n_chars,
       |  CAST(sum(n_syms * c) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(n_syms * c) AS DOUBLE)
       |        / CAST(sum(len(w) * c) AS DOUBLE), 6) AS compression
       |FROM wcs JOIN vf USING (w)
       |GROUP BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ---- q157: BPE merge learning (5 iterations) -----------------------
    // The tokenizer-training loop as a distributed operator. Scale
    // shape (see object doc): corpus → vocabulary once, then every
    // iteration is vocabulary-sized — a pair aggregation, a 1-row
    // argmax broadcast, a row-local merge. The merge report is 5
    // rows; its oracle re-learns the same merges in DuckDB with
    // unrolled CTEs, hash-checking the whole iterative algorithm
    // (argmax tie-breaks, greedy merge-all semantics, and all).
    QueryDef(
      "q157_bpe_merges",
      (s, d) => merges(s, d, 5),
      Some(mergesOracle(5))),

    // ---- q162: corpus encoding with the learned vocab ------------------
    // The application half of q157: per-source token counts under the
    // learned 5-merge vocabulary, plus the compression ratio — the
    // report that says what the tokenizer buys before anyone pays for
    // a corpus re-encode. The scale insight: ENCODING IS A
    // VOCABULARY-SIZED JOIN, never a corpus rewrite — the corpus
    // collapses to (source, word, count) in its one pass, the merge
    // chain runs on distinct words only, and the rollup joins the two
    // vocabulary-sized frames on the word (unhinted: at 100 TB the
    // vocab is ~10⁸ rows — broadcastable it is not; the q69 lesson).
    // All sums are exact integers; `compression` is one IEEE divide
    // of two exact BIGINTs (q111 lesson), rounded to 6.
    QueryDef(
      "q162_bpe_encode",
      (s, d) => {
        val docs = Tables.parallel(s, d, "documents")
        val bySource = docs
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
        val vf = mergedVocab(docs, 5)
          .select(col("w"),
            (size(split(col("s"), "~~")) - 2).cast("long").as("n_syms"))
        bySource.join(vf, "w")
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_words"),
            sum(length(col("w")) * col("c")).as("n_chars"),
            sum(col("n_syms") * col("c")).as("n_bpe_tokens"),
            round(sum(col("n_syms") * col("c")).cast("double")
              / sum(length(col("w")) * col("c")).cast("double"), 6)
              .as("compression"))
      },
      Some(encodeOracle(5)))
  )
}
