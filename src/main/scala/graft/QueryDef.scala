package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (optionally) the
  * equivalent ANSI/DuckDB SQL the driver uses as a correctness oracle.
  * Column names/types must match between the two (the driver sorts
  * columns by name and hashes values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def tuple: (String, (SparkSession, String) => DataFrame) = name -> fn
}
