package graft.streaming

import graft.model.Alert
import org.apache.spark.sql.{Dataset, ForeachWriter}
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink builders for the alert stream (SURVEY.md §2.2: K1 console
  * print, K2 foreach, K3 checkpointed durable state) plus the file and
  * Kafka sinks a production deployment needs. Checkpointing is
  * mandatory for every stateful query — the Spark analog of the
  * reference's `ssc.checkpoint` (BiometricAlertStreamProcessor
  * .scala:36) and Kafka changelog-backed store
  * (KafkaBiometricAlertStreamProcessor.scala:70).
  */
object AlertSinks {

  private def base(alerts: Dataset[Alert], checkpoint: String,
      trigger: Trigger): DataStreamWriter[Alert] =
    alerts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** K1: console print (`alertState.print`). */
  def console(alerts: Dataset[Alert], checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    base(alerts, checkpoint, trigger).format("console").start()

  /** K2: per-element side effect (`Sink.foreach`). */
  def foreach(alerts: Dataset[Alert], checkpoint: String,
      f: Alert => Unit,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    base(alerts, checkpoint, trigger).foreach(new ForeachWriter[Alert] {
      def open(partitionId: Long, epochId: Long): Boolean = true
      def process(value: Alert): Unit = f(value)
      def close(errorOrNull: Throwable): Unit = ()
    }).start()

  /** K2 batch-granular variant: `foreachBatch` hands each micro-batch
    * to arbitrary DataFrame code (e.g. an idempotent JDBC upsert or a
    * merge into a lakehouse table) with the batch id for exactly-once
    * bookkeeping — the Spark-native shape of the reference's
    * side-effecting sink when per-element `foreach` is too fine.
    */
  def foreachBatch(alerts: Dataset[Alert], checkpoint: String,
      f: (Dataset[Alert], Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    base(alerts, checkpoint, trigger).foreachBatch(f).start()

  /** Durable parquet sink (exactly-once via checkpoint + WAL). */
  def parquet(alerts: Dataset[Alert], path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    base(alerts, checkpoint, trigger).format("parquet")
      .option("path", path).start()

  /** Kafka sink: alerts back onto a topic as JSON (requires the
    * spark-sql-kafka connector at runtime).
    */
  def kafka(alerts: Dataset[Alert], bootstrapServers: String, topic: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    alerts
      .select(col("user_id").cast("string").as("key"),
        to_json(struct(col("user_id"), col("message"), col("ts"))).as("value"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .queryName("alerts-to-kafka")
      .start()

  /** Scale posture for the state store: RocksDB provider keeps
    * per-(window,user) and per-user cooldown state off-heap and
    * spillable — required once key cardinality outgrows executor
    * memory (the 100 TB setting). Call before starting queries.
    */
  def useRocksDBStateStore(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
