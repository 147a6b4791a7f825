package graft

import org.apache.spark.sql.functions._

/** Bounds q17's approximation. The HLL++ sketch value has no
  * cross-engine oracle (every engine's sketch differs), so q17 emits
  * the exact count plus a `within_tol` boolean and the DuckDB oracle
  * asserts TRUE — this spec keeps an independent eye on the sketch
  * itself: at rsd = 0.02 a 5% relative-error ceiling is ~2.5σ — loose
  * enough to be deterministic across Spark versions, tight enough
  * that a broken sketch (or a wrong column wired in) fails.
  */
class ApproxDistinctSpec extends SparkSpec {

  test("q17 emits exact counts and an all-true tolerance flag") {
    val rows = SparkEntry.queries("q17_approx_distinct")(spark, sf001)
      .collect()
    assert(rows.nonEmpty, "q17 returned no groups")
    val exact = Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"group ${r.get(0)}: exact_parts mismatch")
      assert(r.getBoolean(2),
        s"group ${r.get(0)}: sketch strayed past 5% of exact")
    }
  }

  test("raw approx_count_distinct stays within 5% of exact per group") {
    // the bound the within_tol flag relies on, measured directly
    val joined = Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"),
        count_distinct(col("l_partkey")).as("e"))
      .collect()
    joined.foreach { r =>
      val a = r.getLong(1).toDouble
      val e = r.getLong(2).toDouble
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.05,
        s"group ${r.get(0)}: approx=$a exact=$e relErr=$relErr > 5%")
    }
  }
}
