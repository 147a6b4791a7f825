package graft.state

import java.time.Duration

import graft.model.{Alert, CooldownState}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The cooldown on Spark 4's `transformWithState` API — the modern
  * arbitrary-state operator (same semantics as [[Cooldown]], the
  * flatMapGroupsWithState version).
  *
  * State is a TTL'd `ValueState[CooldownState]`: the store evicts the
  * per-user record `cooldownMs` after its last write, replacing the
  * GroupState timeout dance entirely — no timers, no watermark
  * coupling. Emission is still decided on EVENT time inside
  * [[handleInputRows]], so results are deterministic regardless of
  * wall clock; the TTL only bounds state size (and, like the
  * reference's `updateStateByKey` expiry, re-arms re-alerting after
  * quiet periods).
  *
  * Requires the RocksDB state store provider
  * (`AlertSinks.useRocksDBStateStore`) — transformWithState's backing
  * store in Spark 4.
  *
  * @param stateTtl enable the TTL (production). Disable only for
  *   synchronous test harnesses: TTL state runs in processing-time
  *   mode, where the microbatch engine schedules batches continuously
  *   and `processAllAvailable()` never sees an idle stream. Disabling
  *   TTL changes only the state-size bound, never emission results.
  */
class CooldownProcessor(cooldownMs: Long, stateTtl: Boolean = true)
    extends StatefulProcessor[Int, Alert, Alert] {

  @transient private var state: ValueState[CooldownState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CooldownState]("cooldown",
      Encoders.product[CooldownState],
      if (stateTtl) TTLConfig(Duration.ofMillis(cooldownMs)) else TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[Alert],
      timerValues: TimerValues): Iterator[Alert] = {
    val sorted = rows.toArray.sortBy(_.ts.getTime)
    var last: Option[Long] =
      if (state.exists()) Some(state.get().triggeredAtMs) else None
    val emitted = Array.newBuilder[Alert]
    sorted.foreach { a =>
      val t = a.ts.getTime
      if (last.forall(l => t >= l + cooldownMs)) {
        last = Some(t)
        emitted += a
        state.update(CooldownState(t))
      }
    }
    emitted.result().iterator
  }
}
