package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Source builders for the raw JSON event streams (SURVEY.md §2.1).
  *
  * | Reference source                           | Here                      |
  * |--------------------------------------------|---------------------------|
  * | S1 queue source (`ssc.queueStream`)        | `MemoryStream` (tests)    |
  * | S2 Akka bounded queue                      | `MemoryStream` + rate cap |
  * | S3 Kafka topic (`builder.stream(...)`)     | [[kafkaJson]]             |
  * | S4 Beam `Create.of(...)`                   | [[inline]]                |
  * | file replay (not in reference; free)       | [[fileJson]]              |
  *
  * All return a single-column `value: string` DataFrame that
  * [[JsonIngest]] parses — the pipeline is source-agnostic.
  */
object EventSources {

  /** Kafka topic → raw JSON stream
    * (KafkaBiometricAlertStreamProcessor.scala:29–30). Requires the
    * spark-sql-kafka connector on the classpath (not shipped in this
    * container — wiring is exercised on a real cluster only).
    * `maxOffsetsPerTrigger` is the admission-control analog of the
    * reference's bounded queue (S2): Spark never drops, it defers.
    */
  def kafkaJson(spark: SparkSession, bootstrapServers: String, topic: String,
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
    maxOffsetsPerTrigger.foreach(n => r.option("maxOffsetsPerTrigger", n))
    r.load().select(col("value").cast("string").as("value"))
  }

  /** Streaming file replay of newline-JSON (scale path for reprocessing:
    * partition-parallel, no driver involvement).
    */
  def fileJson(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).select(col("value"))

  /** Bounded in-memory source (S4, Beam `Create.of`). */
  def inline(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    rows.toDF("value")
  }

  /** Streaming CSV replay with an explicit schema (exports from
    * monitoring systems commonly land as CSV). Permissive mode +
    * `_corrupt_record` mirrors [[JsonIngest]]'s lenient posture: a
    * malformed line must never kill the stream, it surfaces in the
    * corrupt column for a dead-letter sink. Returns typed event
    * columns directly (CSV carries no nesting), unlike the
    * `value: string` JSON sources.
    */
  def fileCsv(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, heart_rate INT, systolic INT, diastolic INT, " +
          "timestamp BIGINT, _corrupt_record STRING"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
}
