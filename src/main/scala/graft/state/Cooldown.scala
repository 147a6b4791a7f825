package graft.state

import graft.model.{Alert, CooldownState}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** The emit-on-rise + TTL cooldown state machine — the one piece of
  * user code in the engine (SURVEY.md §2.8): a single typed
  * `flatMapGroupsWithState` function unifying the reference's three
  * implementations (T1 `updateStateByKey` at
  * BiometricAlertStreamProcessor.scala:67–85, T2 Akka rate limiter at
  * AkkaBiometricAlertStreamProcessor.scala:129–151, T3 Kafka
  * `Transformer` + store at KafkaBiometricAlertStreamProcessor
  * .scala:74–104).
  *
  * Semantics, matching the reference exactly:
  *  - first alert for a user → EMIT, record trigger time, arm TTL;
  *  - further alerts while state is alive → SUPPRESS, and do NOT extend
  *    the cooldown (the reference refreshes state to `false` but keeps
  *    the original trigger time — BiometricAlertStreamProcessor
  *    .scala:69–73 — so re-alerting happens exactly at cooldown expiry
  *    even under continuous alerting);
  *  - TTL expiry → state removed (T1's `None` return), next alert
  *    emits again.
  *
  * Within one invocation alerts are processed in event-time order, so
  * the same function is the greedy leading debounce in batch mode
  * (where each key is seen exactly once).
  *
  * Unlike T2's unbounded HashMap, state here is always evicted by the
  * timeout — bounded state at 100 TB key cardinality; with the RocksDB
  * state-store provider this scales past executor memory.
  */
object Cooldown {

  type Fn = (Int, Iterator[Alert], GroupState[CooldownState]) => Iterator[Alert]

  /** @param cooldownMs suppress re-alerts for this long after an emit
    * @param timeoutConf must match the conf passed to
    *   `flatMapGroupsWithState` (event-time for deterministic tests,
    *   processing-time for reference parity with the DStream pipeline)
    */
  def apply(cooldownMs: Long, timeoutConf: GroupStateTimeout): Fn =
    (_: Int, alerts: Iterator[Alert], state: GroupState[CooldownState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = alerts.toArray.sortBy(_.ts.getTime)
        var last: Option[Long] = state.getOption.map(_.triggeredAtMs)
        val emitted = Array.newBuilder[Alert]
        var armed = false
        sorted.foreach { a =>
          val t = a.ts.getTime
          if (last.forall(l => t >= l + cooldownMs)) {
            last = Some(t)
            emitted += a
            armed = true
          }
        }
        if (armed) {
          state.update(CooldownState(last.get))
          if (timeoutConf == GroupStateTimeout.EventTimeTimeout) {
            // must be past the watermark; clamp defensively
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(last.get + cooldownMs, wm + 1))
          } else if (timeoutConf == GroupStateTimeout.ProcessingTimeTimeout) {
            state.setTimeoutDuration(cooldownMs)
          } // else NoTimeout (batch): state dies with the query
        }
        emitted.result().iterator
      }
    }
}
