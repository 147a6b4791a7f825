package graft.streaming

import graft.model.Alert
import graft.operators.AlertOps
import graft.sources.JsonIngest
import graft.state.Cooldown
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One canonical pipeline subsuming all four reference variants
  * (SURVEY.md §7.1) — their differences collapse into this config:
  *
  * {{{
  * raw HR json ─ parse ─┐
  *                      ├─ union ─ watermark ─ window agg (flags)
  * raw BP json ─ parse ─┘              │
  *                              alert filter + message
  *                                     │
  *                        cooldown flatMapGroupsWithState
  * }}}
  *
  * Reference defaults mirrored here: 5s/1s window, 0s watermark delay
  * (AkkaBiometricAlertStreamProcessor.scala:67 MaxDelay), 5s cooldown
  * (BiometricAlertStreamProcessor.scala:71).
  */
object AlertPipeline {

  final case class Config(
      windowLength: String = "5 seconds",
      windowSlide: String = "1 second",
      watermarkDelay: String = "0 seconds",
      cooldownMs: Long = 5000L,
      timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout)

  /** Raw JSON streams → canonical unioned event stream (P1 + J4). */
  def ingest(hrRaw: DataFrame, bpRaw: DataFrame): DataFrame =
    JsonIngest.unionEvents(
      JsonIngest.heartRate(hrRaw),
      JsonIngest.bloodPressure(bpRaw))

  /** Event stream → per-slide alert stream (W1/W4 + A1 + P6 + P7),
    * before deduplication. Works on batch or streaming input.
    */
  def rawAlerts(events: DataFrame, cfg: Config): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", cfg.watermarkDelay)
      else events
    AlertOps.alerts(
      AlertOps.slidingWindowFlags(withWm, cfg.windowLength, cfg.windowSlide))
  }

  /** Cooldown stage (T1–T3): at most one alert per user per cooldown.
    *
    * Suppression compares EVENT times inside the state function; the
    * GroupState timeout only bounds state lifetime. The default
    * event-time timeout rides on the watermark metadata that
    * `window_time` carried through the upstream aggregation — do NOT
    * re-declare a watermark here (a second EventTimeWatermark node that
    * sees no rows until panes close pins the default min-policy global
    * watermark at 0 and deadlocks the pipeline), and do NOT use
    * ProcessingTimeTimeout with `processAllAvailable` (pending
    * wall-clock timeouts make the microbatch loop spin).
    */
  def dedupe(alerts: DataFrame, cfg: Config): Dataset[Alert] = {
    val spark = alerts.sparkSession
    import spark.implicits._
    alerts.as[Alert]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[graft.model.CooldownState, Alert](
        OutputMode.Append, cfg.timeout)(Cooldown(cfg.cooldownMs, cfg.timeout))
  }

  /** Cooldown stage on the Spark 4 `transformWithState` API (same
    * semantics as [[dedupe]]; TTL'd ValueState instead of GroupState
    * timeouts). Requires the RocksDB state store provider.
    */
  def dedupeTws(alerts: DataFrame, cfg: Config,
      stateTtl: Boolean = true): Dataset[Alert] = {
    val spark = alerts.sparkSession
    import spark.implicits._
    val timeMode =
      if (stateTtl) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    alerts.as[Alert]
      .groupByKey(_.user_id)
      .transformWithState(
        new graft.state.CooldownProcessor(cfg.cooldownMs, stateTtl),
        timeMode, OutputMode.Append())
  }

  /** Full pipeline: raw JSON in, deduplicated alerts out. */
  def apply(hrRaw: DataFrame, bpRaw: DataFrame,
      cfg: Config = Config()): Dataset[Alert] =
    dedupe(rawAlerts(ingest(hrRaw, bpRaw), cfg), cfg)
}
