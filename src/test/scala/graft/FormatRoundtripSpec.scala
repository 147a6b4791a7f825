package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format completeness beyond the driver's parquet:
  * ORC round-trips bit-exactly with working predicate pushdown
  * (Spark's built-in columnar alternative — at 100 TB the engine
  * must not care which columnar container the lake standardized on).
  * CSV and JSON are covered by CsvSourceSpec / q23; Avro is recorded
  * as an environment blocker (the spark-avro CONNECTOR jar is not on
  * the image — the avro core jars alone don't register the source).
  */
class FormatRoundtripSpec extends SparkSpec {

  test("ORC round-trip is bit-exact and pushes predicates to the scan") {
    val dir = Files.createTempDirectory("orc_rt").toString + "/li"
    val li = Tables(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_returnflag"))
    li.write.mode("overwrite").orc(dir)

    val back = spark.read.orc(dir)
    assert(back.count() === li.count())
    val fp = (df: org.apache.spark.sql.DataFrame) => df
      .agg(expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_quantity, " +
        "l_returnflag))").as("h"))
      .collect()(0).getLong(0)
    assert(fp(back) === fp(li), "ORC round-trip must be value-exact")

    // the filter must reach the ORC scan, not run post-scan only
    val plan = back.filter(col("l_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), " +
      "EqualTo(l_orderkey,1)]"),
      s"expected the equality pushed into the ORC scan; plan:\n$plan")
  }

  test("spark-avro connector absence is an environment blocker (re-check)") {
    val err = intercept[Exception] {
      spark.range(1).write.format("avro")
        .save(Files.createTempDirectory("avro_rt").toString + "/x")
    }
    assert(err.getMessage.toLowerCase.contains("avro"),
      "if this starts PASSING a write, the image gained spark-avro — " +
        "upgrade this spec to a round-trip like the ORC one")
  }
}
