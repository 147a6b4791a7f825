package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test tables
  * (TESTDATA.md). At cluster scale the same call sites would point at a
  * partitioned table root; everything downstream is partition-agnostic.
  *
  * Timestamp columns arrive in whatever physical type the driver's
  * writer picked, and both need normalizing to a plain UTC
  * TimestampType so `unix_micros`/window arithmetic resolves:
  *  - TIMESTAMP(NANOS) (no native Spark type): read as
  *    nanos-since-epoch LongType (spark.sql.legacy.parquet.nanosAsLong)
  *    and truncate to microseconds — the same truncation DuckDB's
  *    epoch_us applies, so the oracle arithmetic stays exact;
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
  *    TIMESTAMP_NTZ by default, which unix_micros rejects. Disable the
  *    inference at this chokepoint so the scan yields TimestampType
  *    directly (session tz is UTC everywhere, so the micros value is
  *    identical to DuckDB's naive reading) — a per-column cast would
  *    instead break ts filter pushdown with a Project over the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Engine-wide aggregation tuning, applied at the single chokepoint
    // every query loads tables through (NOT per-query: a query-local
    // conf.set would leak into whatever runs next on the shared
    // session and make behavior order-dependent). ObjectHashAggregate
    // (collect_list/collect_set/TypedImperativeAggregate) silently
    // falls back to sort-based merging past 128 distinct keys per
    // task; the dedup posting-list builds and the 128-wide minhash
    // aggregate carry bounded per-key buffers, and the fallback made
    // the posting build 2× slower than the rest of its query. 8M keys
    // × bounded buffers fits the executor-memory budget this engine
    // sizes partitions for.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (8 * 1024 * 1024).toString)
    // md5long (the native 60-bit md5 key) resolves everywhere the
    // engine runs, extension-registered or not: every query loads its
    // tables through this chokepoint, and registration is idempotent.
    graft.functions.Md5Long.register(spark)
    graft.functions.WinnowFps.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Loader for pipelines whose cost is per-row COMPUTE (shingle md5,
    * minhash, LSH folds, binary decode), not scan bytes. The driver's
    * sf tables are single-row-group parquet files, so the scan yields
    * ONE split (parquet can't split below a row group) and the whole
    * projection would serialize on one core (measured 4s single-core
    * for the sf0.1 shingle pass alone). A production table is
    * thousands of splits, so input parallelism is free there; emulate
    * it locally with a round-robin ONLY when the scan
    * under-parallelizes — on a properly split table this is a no-op
    * passthrough, so no shuffle is added at scale. Scan-light
    * relational queries keep [[apply]]: for them the repartition is
    * pure shuffle cost (measured 3× on a simple aggregate), and
    * broadcast-bound dimension tables must not grow an exchange.
    */
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every driver table as a temp view, so the whole engine
    * surface is reachable through plain `spark.sql(...)` as well as
    * the DataFrame API (with `GraftExtensions` the custom functions
    * resolve there too).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(t => apply(spark, dir, t).createOrReplaceTempView(t))

  def parallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    val out = apply(spark, dir, name)
    val cores = spark.sparkContext.defaultParallelism
    if (out.rdd.getNumPartitions * 2 < cores) out.repartition(cores) else out
  }
}
