package graft

import java.sql.Timestamp

import org.apache.spark.api.java.Optional

import graft.model.{Alert, CooldownState}
import graft.state.Cooldown
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the cooldown state machine against the reference's
  * semantics table (SURVEY.md §5.1): no-state→emit, in-cooldown→
  * suppress (without extending the cooldown), expired→re-emit,
  * timeout→state removed.
  */
class CooldownSpec extends AnyFunSuite {

  private val T0 = 1700000000000L
  private val cooldown = 5000L

  private def alert(ms: Long) =
    Alert(1, "User 1 has a problem", new Timestamp(ms))

  private def freshState(hasTimedOut: Boolean = false,
      st: Option[CooldownState] = None): TestGroupState[CooldownState] =
    TestGroupState.create[CooldownState](
      st.fold(Optional.empty[CooldownState]())(s => Optional.of(s)),
      GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = T0,
      eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(T0 - 60000L)),
      hasTimedOut = hasTimedOut)

  private val fn = Cooldown(cooldown, GroupStateTimeout.EventTimeTimeout)

  test("no prior state: first alert emits, later in-cooldown alerts suppressed") {
    val state = freshState()
    val out = fn(1, Iterator(alert(T0), alert(T0 + 1000), alert(T0 + 6000)), state).toSeq
    assert(out.map(_.ts.getTime) === Seq(T0, T0 + 6000))
    assert(state.get === CooldownState(T0 + 6000))
    assert(state.getTimeoutTimestampMs.get() === T0 + 6000 + cooldown)
  }

  test("live state: alert within cooldown suppressed, cooldown NOT extended") {
    val state = freshState(st = Some(CooldownState(T0)))
    val out = fn(1, Iterator(alert(T0 + 2000)), state).toSeq
    assert(out.isEmpty)
    assert(state.get === CooldownState(T0)) // original trigger time kept
    // a suppressed invocation must still re-arm the GC timeout:
    // GroupState clears any pending timeout on each invocation, and
    // skipping the re-arm here would leave the state unexpirable
    // (unbounded-state leak under alert-suppress-alert traffic)
    assert(state.getTimeoutTimestampMs.get() === T0 + cooldown)
  }

  test("live state: alert at exactly cooldown expiry re-emits") {
    val state = freshState(st = Some(CooldownState(T0)))
    val out = fn(1, Iterator(alert(T0 + cooldown)), state).toSeq
    assert(out.map(_.ts.getTime) === Seq(T0 + cooldown))
    assert(state.get === CooldownState(T0 + cooldown))
  }

  test("timeout: state removed, nothing emitted") {
    val state = freshState(hasTimedOut = true, st = Some(CooldownState(T0)))
    val out = fn(1, Iterator.empty, state).toSeq
    assert(out.isEmpty)
    assert(state.isRemoved)
  }

  test("out-of-order alerts within a batch are debounced in event-time order") {
    val state = freshState()
    val out = fn(1, Iterator(alert(T0 + 6000), alert(T0)), state).toSeq
    assert(out.map(_.ts.getTime) === Seq(T0, T0 + 6000))
  }
}
