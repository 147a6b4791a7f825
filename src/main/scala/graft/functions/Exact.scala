package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregates over doubles.
  *
  * `round(sum(x), 2)` is NOT reproducible across engines: FP addition is
  * non-associative, partial-aggregation order differs, and a half-cent
  * boundary flips the rounded result. Fix: round each term to a fixed
  * scale (an identical IEEE op on an identically-computed double in
  * both engines) and sum exact integers — the sum is then
  * order-independent, and everything derived from it (avg, final
  * rounding) is deterministic. This also reflects how a production
  * engine would aggregate money at 100 TB (decimal/fixed-point, not
  * raw doubles).
  */
object Exact {

  /** Spark: Σ x as fixed-point with `digits` decimals, returned as double. */
  def sumFixed(e: String, digits: Int = 2): Column = {
    val f = factor(digits)
    sum(expr(s"cast(round(($e) * $f, 0) as bigint)")) / lit(f.toDouble)
  }

  /** DuckDB mirror of [[sumFixed]]. */
  def sumFixedSql(e: String, digits: Int = 2): String = {
    val f = factor(digits)
    s"(sum(CAST(round(($e) * $f) AS BIGINT)) / $f.0)"
  }

  private def factor(digits: Int): Long = math.pow(10, digits).toLong
}
