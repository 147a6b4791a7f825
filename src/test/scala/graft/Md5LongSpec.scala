package graft

import graft.functions.Md5Long
import org.apache.spark.sql.functions._

/** md5long must be bit-identical to the portable SQL chain it
  * replaces — `cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)` —
  * on every input class the engine feeds it (ASCII shingles,
  * multi-byte UTF-8, empty string, null), through BOTH evaluation
  * paths: whole-stage codegen (plain projection) and interpreted
  * (inside a transform() lambda, where the hot paths run it).
  */
class Md5LongSpec extends SparkSpec {

  test("bit-identical to the conv(substr(md5)) chain, codegen path") {
    Md5Long.register(spark)
    import spark.implicits._
    val rows = (0 until 2000).map(i => s"doc $i body ${i * 31 % 997}") ++
      Seq("", "héllo wörld", "日本語テキスト", "a", "tab\tnewline\n")
    val df = rows.toDF("s")
      .select(col("s"),
        expr("md5long(s)").as("fast"),
        expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
    assert(df.filter(col("fast") < 0).count() === 0, "60-bit value is non-negative")
  }

  test("bit-identical inside a transform() lambda (interpreted path) and null-safe") {
    Md5Long.register(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over", "abcdefgh")
      .toDF("text")
      .select(
        expr("transform(sequence(1, length(text) - 7), i -> " +
          "md5long(substring(text, i, 8)))").as("fast"),
        expr("transform(sequence(1, length(text) - 7), i -> " +
          "cast(conv(substr(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))")
          .as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    val nulls = spark.sql("SELECT md5long(cast(null as string)) AS v")
    assert(nulls.collect().head.isNullAt(0), "null in, null out")
  }
}
