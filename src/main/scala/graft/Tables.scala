package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test tables
  * (TESTDATA.md). At cluster scale the same call sites would point at a
  * partitioned table root; everything downstream is partition-agnostic.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
  * type for: read it as nanos-since-epoch LongType
  * (spark.sql.legacy.parquet.nanosAsLong) and truncate to a microsecond
  * TimestampType — the same truncation DuckDB's epoch_us applies, so
  * the oracle arithmetic stays exact (integer µs, no floating point).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }
}
