package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's built-in bloom-filter sketch expressions
  * (`org.apache.spark.util.sketch.BloomFilter` backed): the same
  * machinery Catalyst's runtime-filter injection uses, exposed as
  * callable functions —
  *
  *  - `bloom_agg(longCol, estItems, numBits)` → binary sketch
  *  - `bloom_contains(sketch, longCol)` → boolean (no false negatives)
  *
  * This is the scale form of a semi-join prefilter: build the sketch
  * over the SMALL side (one aggregate, a few hundred KB regardless of
  * row count), embed it as a scalar subquery, and the big side tests
  * membership inside its scan projection — no shuffle, no broadcast
  * hash table proportional to the small side's row count. False
  * positives are culled by the exact join that follows, so semantics
  * are unchanged while the join's input shrinks by the true-negative
  * rate. `bloom_contains` requires a foldable sketch (a literal or
  * scalar subquery) — the same constraint Spark's own injected
  * runtime filters satisfy.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
