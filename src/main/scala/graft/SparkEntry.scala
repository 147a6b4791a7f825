package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Bpe, Dedup, EventOps, Multimodal, Relational, Similarity, TextOps, TrainPrep, WebCuration}
import graft.stores.StoreManifest

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (or the
  * extended training-data-pipeline surface); `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's hash-match correctness gate.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    Relational.defs ++ EventOps.defs ++ TextOps.defs ++ Dedup.defs ++
      Similarity.defs ++ Multimodal.defs ++ TrainPrep.defs ++ Bpe.defs ++
      StoreManifest.defs ++ WebCuration.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
