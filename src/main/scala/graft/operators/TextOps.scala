package graft.operators

import graft.{QueryDef, Tables}
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
             |FROM documents""".stripMargin))
  )
}
