package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

/** The native expression must agree with the HOF formulation it
  * replaced (same left-to-right accumulation) in both interpreted and
  * codegen paths.
  */
class CosineSimilaritySpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / " +
      "(sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x)) * " +
      "sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))"

  test("matches the HOF formulation bit-for-bit on random vectors") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val rnd = new scala.util.Random(1)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("native", expr("cosine_sim(a, b)"))
      .withColumn("viaHof", expr(hof))
    val bad = df.filter(col("native") =!= col("viaHof")).count()
    assert(bad === 0)
  }

  test("identical vectors give 1.0; orthogonal give 0.0; zero vector gives 0.0") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))
    ).toDF("a", "b").withColumn("sim", expr("cosine_sim(a, b)"))
    val sims = df.select("sim").collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) === 0.0)
    assert(sims(2) === 0.0)
  }

  test("null inputs yield null") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b").selectExpr("cosine_sim(a, b) AS sim")
    assert(df.collect().head.isNullAt(0))
  }

  test("length mismatch and null elements yield null, not a truncated/garbage value (codegen)") {
    CosineSimilarity.register(spark)
    graft.functions.SquaredDistance.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1D, 2D), array(1D)) AS c_len,
        |  l2sq(array(1D, 2D), array(1D)) AS l_len,
        |  cosine_sim(array(1D, cast(null AS double)), array(1D, 2D)) AS c_nul,
        |  l2sq(array(1D, cast(null AS double)), array(1D, 2D)) AS l_nul,
        |  l2sq(array(1D, 2D), array(3D, 5D)) AS l_ok
        |""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) === 13.0)
  }

  test("length mismatch and null elements yield null on the interpreted eval path too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def arr(xs: Seq[Any]) = Literal.create(xs, ArrayType(DoubleType, containsNull = true))
    val short = arr(Seq(1.0))
    val full = arr(Seq(1.0, 2.0))
    val holed = arr(Seq(1.0, null))
    assert(CosineSimilarity(full, short).eval(null) === null)
    assert(graft.functions.SquaredDistance(full, short).eval(null) === null)
    assert(CosineSimilarity(holed, full).eval(null) === null)
    assert(graft.functions.SquaredDistance(holed, full).eval(null) === null)
    assert(graft.functions.SquaredDistance(full, arr(Seq(3.0, 5.0))).eval(null) === 13.0)
  }
}
