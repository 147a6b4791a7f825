package graft

import org.apache.spark.sql.functions._

/** Bounds q17's approximation: the HLL++ sketch has no cross-engine
  * value oracle (every engine's sketch differs), but its published
  * error bound is checkable against the exact count on the same
  * input. At rsd = 0.02 a 5% relative-error ceiling is ~2.5σ — loose
  * enough to be deterministic across Spark versions, tight enough
  * that a broken sketch (or a wrong column wired in) fails.
  */
class ApproxDistinctSpec extends SparkSpec {

  test("q17 approx_count_distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("q17_approx_distinct")(spark, sf001)
    val exact = Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("exact_parts"))
    val joined = approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"))
      .collect()
    assert(joined.nonEmpty, "q17 returned no groups")
    joined.foreach { r =>
      val a = r.getLong(1).toDouble
      val e = r.getLong(2).toDouble
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.05,
        s"group ${r.get(0)}: approx=$a exact=$e relErr=$relErr > 5%")
    }
  }
}
