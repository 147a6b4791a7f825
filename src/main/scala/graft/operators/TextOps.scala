package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (token stats, language ID heuristic,
  * quality scoring, content fingerprinting). All expressed as built-in
  * codegen'd expressions (no UDFs): at 100 TB these run inside
  * whole-stage codegen directly over the parquet scan, embarrassingly
  * parallel, no shuffle except the final (tiny) aggregations.
  */
object TextOps {

  /** Small English stopword set for the n-gram/stopword language-ID
    * heuristic. Deterministic and identical on the oracle side.
    */
  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val enStopSql = enStop.map(w => s"'$w'").mkString(", ")

  val defs: Seq[QueryDef] = Seq(
    // ---- q30: token counting (whitespace + alpha-regex) ----------------
    QueryDef(
      "q30_token_stats",
      (s, d) =>
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_alpha_tokens"),
          length(col("text")).as("len_chars"),
          round(length(col("text")) / size(split(col("text"), " ")), 4).as("avg_tok_len")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_alpha_tokens,
             |  CAST(length(text) AS INTEGER) AS len_chars,
             |  round(length(text) / len(string_split(text, ' ')), 4) AS avg_tok_len
             |FROM documents""".stripMargin)),

    // ---- q31: language-ID heuristic (stopword ratio) -------------------
    QueryDef(
      "q31_lang_id",
      (s, d) =>
        Tables(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_stop",
            size(filter(col("toks"), t => t.isin(enStop: _*))))
          .select(
            col("doc_id"),
            round(col("n_stop") / size(col("toks")), 4).as("en_ratio"),
            when(col("n_stop") / size(col("toks")) >= 0.15, "en")
              .otherwise("other").as("guess")),
      Some(s"""SELECT doc_id,
              |  round(len(list_filter(string_split(text, ' '),
              |            t -> t IN ($enStopSql))) / len(string_split(text, ' ')), 4)
              |    AS en_ratio,
              |  CASE WHEN len(list_filter(string_split(text, ' '),
              |              t -> t IN ($enStopSql))) / len(string_split(text, ' ')) >= 0.15
              |       THEN 'en' ELSE 'other' END AS guess
              |FROM documents""".stripMargin)),

    // ---- q32: quality scoring (length × type-token ratio) --------------
    QueryDef(
      "q32_quality",
      (s, d) =>
        Tables(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n", size(col("toks")))
          .withColumn("nd", size(array_distinct(col("toks"))))
          .select(
            col("doc_id"),
            round(col("nd") / col("n"), 4).as("ttr"),
            round(least(lit(1.0), col("n") / 100.0) * (col("nd") / col("n")), 4)
              .as("quality")),
      Some("""SELECT doc_id,
             |  round(len(list_distinct(string_split(text, ' ')))
             |        / len(string_split(text, ' ')), 4) AS ttr,
             |  round(least(1.0, len(string_split(text, ' ')) / 100.0)
             |        * (len(list_distinct(string_split(text, ' ')))
             |           / len(string_split(text, ' '))), 4) AS quality
             |FROM documents""".stripMargin)),

    // ---- q33: document fingerprinting ----------------------------------
    QueryDef(
      "q33_fingerprint",
      (s, d) =>
        Tables(s, d, "documents").select(
          col("doc_id"),
          md5(col("text")).as("fp"),
          md5(substring(col("text"), 1, 64)).as("prefix_fp")),
      Some("""SELECT doc_id, md5(text) AS fp,
             |  md5(substr(text, 1, 64)) AS prefix_fp
             |FROM documents""".stripMargin)),

    // ---- q39: winnowing fingerprints (rolling k-gram window minima) ----
    // Moss-style winnowing: hash every character 8-gram, slide a
    // 4-hash window, keep each window's minimum — the classic
    // position-robust fingerprint set for plagiarism/overlap detection
    // (a shared substring of ≥ 11 chars guarantees a shared
    // fingerprint). Entirely row-local array math in the projection —
    // no explode, no shuffle; the output digests the per-doc
    // fingerprint SET to exact scalar aggregates. ~300 hashes per doc
    // make this the heaviest per-row projection in the text family,
    // hence the parallelized loader.
    QueryDef(
      "q39_winnow_fp",
      (s, d) =>
        Tables.parallel(s, d, "documents")
          .filter(length(col("text")) >= 11) // k + w - 1
          .select(col("doc_id"), expr(
            "transform(sequence(1, length(text) - 7), i -> " +
              "cast(conv(substr(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))")
            .as("khs"))
          .select(col("doc_id"), array_distinct(expr(
            "transform(sequence(1, size(khs) - 3), j -> array_min(slice(khs, j, 4)))"))
            .as("fps"))
          .select(
            col("doc_id"),
            coalesce(size(col("fps")), lit(0)).as("n_fps"),
            array_min(col("fps")).as("fp_min"),
            array_max(col("fps")).as("fp_max"),
            expr("aggregate(fps, 0L, (acc, x) -> acc + pmod(x, 2147483647))")
              .as("fp_modsum")),
      Some("""WITH h AS (SELECT doc_id, u.i AS i,
             |            ('0x' || substr(md5(substr(text, u.i, 8)), 1, 15))::BIGINT AS kh
             |          FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
             |          WHERE length(text) >= 11),
             |w AS (SELECT doc_id, i,
             |        min(kh) OVER (PARTITION BY doc_id ORDER BY i
             |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             |        max(i) OVER (PARTITION BY doc_id) AS n
             |      FROM h),
             |fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - 3)
             |SELECT doc_id,
             |  CAST(count(*) AS INTEGER) AS n_fps,
             |  min(fp) AS fp_min,
             |  max(fp) AS fp_max,
             |  CAST(sum(fp % 2147483647) AS BIGINT) AS fp_modsum
             |FROM fps GROUP BY doc_id""".stripMargin)),

    // ---- q58: vocabulary heavy hitters (global top-k terms) ------------
    // Corpus vocabulary stats: global term frequencies, top 20. The
    // orderBy+limit compiles to TakeOrderedAndProject — per-partition
    // top-k then a k-row merge on the driver, NEVER a global sort of
    // the vocabulary (the scale shape for heavy hitters; at extreme
    // cardinality you'd front a count-min sketch, same output
    // contract). Tie-broken on the term so the result is total-order
    // deterministic.
    QueryDef(
      "q58_vocab_topk",
      (s, d) =>
        Tables(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term").asc)
          .limit(20),
      Some("""SELECT u.term, count(*) AS n
             |FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
             |GROUP BY 1 ORDER BY n DESC, term LIMIT 20""".stripMargin)),

    // ---- q60: grouped top-k (top terms per language) -------------------
    // The per-stratum complement of q58: rank inside each language
    // partition. The rank window re-shuffles only the (lang, term)
    // AGGREGATE — vocabulary-sized, not corpus-sized — and each
    // language sorts independently; with a bounded k you'd swap the
    // window for the q40-style argmax struct when strata are huge.
    QueryDef(
      "q60_grouped_topk",
      (s, d) => {
        val counts = Tables(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("term"))
          .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("term").asc)
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("lang"), col("term"), col("n"), col("rk"))
      },
      Some("""WITH c AS (SELECT lang, u.term, count(*) AS n
             |          FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
             |          GROUP BY 1, 2),
             |r AS (SELECT lang, term, n,
             |        CAST(row_number() OVER (PARTITION BY lang
             |               ORDER BY n DESC, term) AS INTEGER) AS rk
             |      FROM c)
             |SELECT lang, term, n, rk FROM r WHERE rk <= 3""".stripMargin)),

    // ---- q63: BPE-style pretokenization counts -------------------------
    // Token accounting under a GPT-2-style pretokenizer (letter runs,
    // digit runs, punctuation runs, whitespace runs — each optionally
    // space-prefixed), restricted to the RE2-compatible subset (no
    // lookahead) so Java regex and the oracle's RE2 agree. This is
    // the "how many tokens will the tokenizer see" estimate a data
    // mixture is budgeted with — whitespace word counts (q30)
    // undercount punctuation splits.
    QueryDef(
      "q63_bpe_pretokenize",
      (s, d) => {
        val pat = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_pretok"),
          size(array_distinct(regexp_extract_all(col("text"), lit(pat), lit(0))))
            .as("n_distinct"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
             |       AS INTEGER) AS n_pretok,
             |  CAST(len(list_distinct(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')))
             |       AS INTEGER) AS n_distinct
             |FROM documents""".stripMargin))
  )
}
