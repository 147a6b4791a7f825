package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q44 stage costs (not a test; run via
  * Test/runMain graft.ProfileQ44).
  *
  * NOTE: the inline N1/N2/N3 stages reproduce the ROUND-4 pair
  * generation (one flatten(transform(transform(...))) block per
  * group) and are kept as the A/B record against the round-5
  * production path (stacked codegen explodes in
  * Similarity.saltedPairs): on the skew corpus the old N2 stage alone
  * costs ~37 s while `full q44` — the production query — runs ~3 s.
  */
object ProfileQ44 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CosineSimilarity.register(spark)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }

    val e = Tables(spark, d, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

    // warm
    e.count(); e.count()

    val fullFn = SparkEntry.queries("q44_embed_neardup")
    if (sys.env.contains("SPARK_GRAFT_PROFILE_FULL")) {
      time("full q44 (1)")(fullFn(spark, d).count())
      time("full q44 (2)")(fullFn(spark, d).count())
    }

    // stage A: bands projection only
    def planeCoef(p: Int, i: Int): Double = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p-$i".getBytes("UTF-8"))
      if ((dg(0) & 0x80) != 0) 1.0 else -1.0
    }
    def planeDot(v: org.apache.spark.sql.Column, p: Int) = {
      val coefs = array((0 until 64).map(i => lit(planeCoef(p, i))): _*)
      aggregate(zip_with(v, coefs, (x, c) => x * c), lit(0.0), (a, x) => a + x)
    }
    def bandKeyCol(v: org.apache.spark.sql.Column, b: Int) =
      when(planeDot(v, 2 * b) > 0, lit(1L)).otherwise(lit(0L)) +
        when(planeDot(v, 2 * b + 1) > 0, lit(2L)).otherwise(lit(0L))

    def bucketColL(v: org.apache.spark.sql.Column) =
      (0 to 7).map { p =>
        when(planeDot(v, p) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val K = 4
    val nbands = e.select(col("vec_id"), bucketColL(col("v")).as("sig"))
      .select(col("vec_id"), col("sig"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, shiftright(sig, 2*b) % 4 AS bk))")).as("x"))
      .select(col("vec_id"), col("sig"), col("x.band").as("band"), col("x.bk").as("bk"))
    val chunked = nbands
      .withColumn("c", pmod(col("vec_id"), lit(K)))
      .withColumn("cc", explode(expr(
        s"transform(sequence(0, ${K - 1}), g -> struct(least(g, c) AS c1, greatest(g, c) AS c2))")))
      .select(col("band"), col("bk"), col("cc.c1").as("c1"), col("cc.c2").as("c2"), col("c"),
        struct(col("vec_id").as("id"), col("sig").as("sg")).as("m"))
    val grouped = chunked
      .groupBy(col("band"), col("bk"), col("c1"), col("c2"))
      .agg(
        sort_array(collect_list(when(col("c") === col("c1"), col("m")))).as("la"),
        sort_array(collect_list(when(col("c") === col("c2") && col("c1") =!= col("c2"), col("m")))).as("lb"))
      .filter((col("c1") === col("c2") && size(col("la")) >= 2) ||
        (col("c1") =!= col("c2") && size(col("la")) >= 1 && size(col("lb")) >= 1))
      .repartition(spark.sparkContext.defaultParallelism)
    val npairs = grouped
      .select(col("band"), explode(when(col("c1") === col("c2"), expr(
        "flatten(transform(sequence(0, size(la)-2), i -> transform(sequence(i+1, size(la)-1), j -> struct(la[i] AS a, la[j] AS b))))"))
        .otherwise(expr(
          "flatten(transform(la, x -> transform(lb, y -> struct(x AS a, y AS b))))"))).as("p"))
      .select(col("band"),
        when(col("p.a.id") < col("p.b.id"), col("p.a")).otherwise(col("p.b")).as("pa"),
        when(col("p.a.id") < col("p.b.id"), col("p.b")).otherwise(col("p.a")).as("pb"))
      .select(col("band"), col("pa.id").as("ia"), col("pa.sg").as("sa"),
        col("pb.id").as("ib"), col("pb.sg").as("sb"))
      .filter((0 to 2).map(bp =>
        (col("band") <= bp) ||
          (shiftright(col("sa"), 2 * bp) % 4 =!= shiftright(col("sb"), 2 * bp) % 4)).reduce(_ && _))
      .select(col("ia"), col("ib"))
    time("N1 grouped")(grouped.count())
    time("N2 pairs+dedup")(npairs.count())
    val nr = npairs
      .join(e.select(col("vec_id").as("ia"), col("v").as("qv")), "ia")
      .join(e.select(col("vec_id").as("ib"), col("v").as("cv")), "ib")
      .withColumn("sim", expr("cosine_sim(qv, cv)"))
      .filter(col("sim") >= 0.5)
    time("N3 +rerank")(nr.count())
    time("N3 again")(nr.count())

    if (!sys.env.contains("SPARK_GRAFT_PROFILE_NAIVE")) { spark.stop(); return }
    val bandCols = (0 to 3).map(b =>
      struct(lit(b).as("band"), bandKeyCol(col("v"), b).as("bk")))
    val bands = e.select(col("vec_id"), explode(array(bandCols: _*)).as("x"))
      .select(col("vec_id"), col("x.band").as("band"), col("x.bk").as("bk"))
    time("A bands proj")(bands.count())

    val cands = bands.groupBy(col("band"), col("bk"))
      .agg(sort_array(collect_set(col("vec_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ds)-2), i -> " +
          "transform(sequence(i+1, size(ds)-1), j -> " +
          "struct(ds[i] AS ia, ds[j] AS ib))))")).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
    time("B pair explode")(cands.count())
    time("C + distinct")(cands.distinct().count())
    val reranked = cands.distinct()
      .join(e.select(col("vec_id").as("ia"), col("v").as("qv")), "ia")
      .join(e.select(col("vec_id").as("ib"), col("v").as("cv")), "ib")
      .withColumn("sim", expr("cosine_sim(qv, cv)"))
      .filter(col("sim") >= 0.5)
    time("D + rerank")(reranked.count())
    spark.stop()
  }
}
