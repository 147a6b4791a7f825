package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment behind q211 (not a test — run via
  * Test/runMain graft.ProfileClfBalance [sfDir]): q210's first
  * held-out measurement read 94.7% accuracy with 0/6 recall. This
  * ran the candidate fixes in sequence and measured each:
  *
  *   plain/balanced/averaged perceptron (3–8 steps)  → all collapse
  *     to a degenerate all-one-class predictor (balanced updates
  *     overshoot and OSCILLATE between the two poles — each
  *     synchronized batch step updates with the full misclassified
  *     mass, and averaging the iterates just picks a pole)
  *   + structural features (bias/n/nd buckets)       → still
  *     degenerate under iterative training
  *   balanced Rocchio direction + midpoint threshold → recall 6/6,
  *     acc 0.735 — the first non-degenerate model
  *   + train-optimal balanced threshold              → recall 6/6,
  *     acc 0.850, the shape promoted to q211
  *
  * Kept as the measured record of WHY q211 is closed-form Rocchio
  * rather than a rebalanced perceptron.
  */
object ProfileClfBalance {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    import graft.operators.TrainPrep

    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val assign = TrainPrep.clusterSafeAssignment(spark, d)
      .select(col("doc_id"), (col("split") === "train").as("is_train"))
      .localCheckpoint(true)
    val labels = TrainPrep.clfLabels(docs).localCheckpoint(true)
    val feats = TrainPrep.clfFeatures(docs, "text", Seq("doc_id"))
      .localCheckpoint(true)
    val trainIds = assign.filter(col("is_train")).select(col("doc_id"))
    val fTr = feats.join(trainIds, "doc_id").localCheckpoint(true)
    val lTr = labels.join(trainIds, "doc_id").localCheckpoint(true)

    println("label prior (train split):")
    lTr.groupBy(col("y")).count().orderBy("y").show()

    // balanced labels: wt = opposite-class count (>=1 so a one-class
    // corpus degrades to the plain trainer, not an all-zero model)
    val cnts = lTr.agg(
      greatest(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(1L))
        .as("npos"),
      greatest(sum(when(col("y") === -1L, 1L).otherwise(0L)), lit(1L))
        .as("nneg"))
    val lTrW = lTr.crossJoin(broadcast(cnts))
      .select(col("doc_id"), col("y"),
        when(col("y") === 1L, col("nneg")).otherwise(col("npos")).as("wt"))
      .localCheckpoint(true)

    def deltaW(feats: DataFrame, labels: DataFrame, w: DataFrame): DataFrame = {
      val margins = feats
        .join(broadcast(w.select(col("j"), col("w"))), Seq("j"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("margin"))
      val upd = labels.join(margins, Seq("doc_id"))
        .filter(col("y") * col("margin") <= 0)
        .select(col("doc_id"), (col("y") * col("wt")).as("yw"))
      feats.join(upd, "doc_id")
        .groupBy(col("j")).agg(sum(col("yw") * col("c")).as("w"))
    }

    def trainW(feats: DataFrame, labels: DataFrame, steps: Int,
        averaged: Boolean = false): DataFrame = {
      var w: DataFrame =
        spark.range(0).select(col("id").as("j"), col("id").as("w"))
      var acc: DataFrame =
        spark.range(0).select(col("id").as("j"), col("id").as("w"))
      for (_ <- 1 to steps) {
        w = w.union(deltaW(feats, labels, w))
          .groupBy(col("j")).agg(sum(col("w")).as("w"))
          .localCheckpoint(true)
        acc = acc.union(w).groupBy(col("j")).agg(sum(col("w")).as("w"))
          .localCheckpoint(true)
      }
      if (averaged) acc else w
    }

    def confusion(tag: String, w: DataFrame): Unit = {
      val arr = Array.fill(TrainPrep.ClfBuckets)(0L)
      w.collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      val c = TrainPrep.withClfScore(docs, "text", Some(arr))
        .select(col("doc_id"), (col("clf_score") > 0).as("pred"))
        .join(assign.filter(not(col("is_train"))).select(col("doc_id")),
          "doc_id")
        .join(labels, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && col("y") === -1L, 1L).otherwise(0L)).as("fp"),
          sum(when(not(col("pred")) && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
          sum(when(not(col("pred")) && col("y") === -1L, 1L).otherwise(0L)).as("tn"))
        .collect()(0)
      val (n, tp, fp, fn, tn) = (c.getLong(0), c.getLong(1), c.getLong(2),
        c.getLong(3), c.getLong(4))
      println(f"$tag%-16s n=$n tp=$tp fp=$fp fn=$fn tn=$tn " +
        f"acc=${(tp + tn).toDouble / n}%.3f " +
        f"prec=${if (tp + fp == 0) Double.NaN else tp.toDouble / (tp + fp)}%.3f " +
        f"rec=${if (tp + fn == 0) Double.NaN else tp.toDouble / (tp + fn)}%.3f")
    }

    // structural features: the label is quality(n, nd) >= 0.3, i.e.
    // nd >= max(30, 0.3 n) — linear in (n, nd, 1) but INVISIBLE to
    // sign-randomized hashed bag-of-words. Reserve three buckets
    // (1021 bias, 1022 n, 1023 nd); term features hash into [0, 1021).
    val structFeats = {
      val terms = docs
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("bi", when(size(col("t")) >= 2, expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> concat_ws(' ', slice(t, i, 2)))"))
          .otherwise(expr("cast(array() as array<string>)")))
      val hashed = terms
        .select(col("doc_id"), explode(concat(col("t"), col("bi"))).as("term"))
        .select(col("doc_id"),
          pmod(expr("md5long(term)"), lit(1021L)).as("j"),
          when(pmod(expr("md5long(concat('s#', term))"), lit(2)) === 0, 1L)
            .otherwise(-1L).as("sign"))
        .groupBy(col("doc_id"), col("j")).agg(sum(col("sign")).as("c"))
      val struct = terms.select(col("doc_id"),
        size(col("t")).cast("long").as("n"),
        size(array_distinct(col("t"))).cast("long").as("nd"))
        .select(col("doc_id"), explode(map(
          lit(1021L), lit(1L),
          lit(1022L), col("n"),
          lit(1023L), col("nd"))).as(Seq("j", "c")))
      hashed.unionByName(struct)
    }.localCheckpoint(true)
    val sfTr = structFeats.join(trainIds, "doc_id").localCheckpoint(true)

    def confusionF(tag: String, w: DataFrame): Unit = {
      val preds = structFeats
        .join(broadcast(w.select(col("j"), col("w"))), Seq("j"), "left")
        .groupBy(col("doc_id"))
        .agg((sum(col("c") * coalesce(col("w"), lit(0L))) > 0).as("pred"))
      val c = preds
        .join(assign.filter(not(col("is_train"))).select(col("doc_id")),
          "doc_id")
        .join(labels, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && col("y") === -1L, 1L).otherwise(0L)).as("fp"),
          sum(when(not(col("pred")) && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
          sum(when(not(col("pred")) && col("y") === -1L, 1L).otherwise(0L)).as("tn"))
        .collect()(0)
      val (n, tp, fp, fn, tn) = (c.getLong(0), c.getLong(1), c.getLong(2),
        c.getLong(3), c.getLong(4))
      println(f"$tag%-16s n=$n tp=$tp fp=$fp fn=$fn tn=$tn " +
        f"acc=${(tp + tn).toDouble / n}%.3f " +
        f"prec=${if (tp + fp == 0) Double.NaN else tp.toDouble / (tp + fp)}%.3f " +
        f"rec=${if (tp + fn == 0) Double.NaN else tp.toDouble / (tp + fn)}%.3f")
    }

    val lTrPlain = lTr.select(col("doc_id"), col("y"), lit(1L).as("wt"))
    confusion("plain-3", trainW(fTr, lTrPlain, 3))
    confusion("balanced-3", trainW(fTr, lTrW, 3))
    confusionF("struct-bal-3", trainW(sfTr, lTrW, 3))

    // Rocchio / thresholded balanced centroid: direction w1 = the
    // balanced class-mean difference (= the first balanced perceptron
    // step), decision threshold the midpoint of the class-mean TRAIN
    // margins — all integer (compare 2·np·nn·margin > nn·Spos + np·Sneg).
    def rocchio(feats: DataFrame, labTr: DataFrame, tag: String): Unit = {
      val w1 = deltaW(feats,
        labTr.select(col("doc_id"), col("y"),
          when(col("y") === 1L, col("wt")).otherwise(col("wt")).as("wt")),
        spark.range(0).select(col("id").as("j"), col("id").as("w")))
        .localCheckpoint(true)
      val margins = feats
        .join(broadcast(w1.select(col("j"), col("w"))), Seq("j"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("margin"))
      val th = labTr.join(margins, "doc_id")
        .agg(
          sum(when(col("y") === 1L, col("margin")).otherwise(0L)).as("spos"),
          sum(when(col("y") === -1L, col("margin")).otherwise(0L)).as("sneg"),
          greatest(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(1L))
            .as("np"),
          greatest(sum(when(col("y") === -1L, 1L).otherwise(0L)), lit(1L))
            .as("nn"))
        .collect()(0)
      val (spos, sneg, np, nn) =
        (th.getLong(0), th.getLong(1), th.getLong(2), th.getLong(3))
      // pred: 2*np*nn*margin > nn*spos + np*sneg (exact midpoint test)
      val allMargins = structFeats
        .join(broadcast(w1.select(col("j"), col("w"))), Seq("j"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("margin"))
      val predsR = allMargins
        .select(col("doc_id"),
          (col("margin") * lit(2L * np * nn) >
            lit(nn * spos + np * sneg)).as("pred"))
      val c = predsR
        .join(assign.filter(not(col("is_train"))).select(col("doc_id")),
          "doc_id")
        .join(labels, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && col("y") === -1L, 1L).otherwise(0L)).as("fp"),
          sum(when(not(col("pred")) && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
          sum(when(not(col("pred")) && col("y") === -1L, 1L).otherwise(0L)).as("tn"))
        .collect()(0)
      val (n, tp, fp, fn, tn) = (c.getLong(0), c.getLong(1), c.getLong(2),
        c.getLong(3), c.getLong(4))
      println(f"$tag%-16s n=$n tp=$tp fp=$fp fn=$fn tn=$tn " +
        f"acc=${(tp + tn).toDouble / n}%.3f " +
        f"prec=${if (tp + fp == 0) Double.NaN else tp.toDouble / (tp + fp)}%.3f " +
        f"rec=${if (tp + fn == 0) Double.NaN else tp.toDouble / (tp + fn)}%.3f")
    }
    rocchio(sfTr, lTrW, "rocchio-struct")

    // train-optimal balanced threshold: among candidate cuts (each
    // distinct train margin), pick the one minimizing the class-
    // weighted train error err(tau) = nneg*|pos: margin <= tau| +
    // npos*|neg: margin > tau|; ties -> smallest tau. All integer,
    // replayable with window cumulatives.
    {
      val w1 = deltaW(sfTr, lTrW,
        spark.range(0).select(col("id").as("j"), col("id").as("w")))
        .localCheckpoint(true)
      def marginsOf(f: DataFrame) = f
        .join(broadcast(w1.select(col("j"), col("w"))), Seq("j"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("margin"))
      val mTr = lTrW.join(marginsOf(sfTr), "doc_id").localCheckpoint(true)
      val cnts2 = mTr.agg(
        greatest(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(1L)),
        greatest(sum(when(col("y") === -1L, 1L).otherwise(0L)), lit(1L)))
        .collect()(0)
      val (np, nn) = (cnts2.getLong(0), cnts2.getLong(1))
      import org.apache.spark.sql.expressions.Window
      val wnd = Window.orderBy(col("margin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cand = mTr
        .withColumn("cpos", sum(when(col("y") === 1L, 1L).otherwise(0L))
          .over(wnd))
        .withColumn("cneg", sum(when(col("y") === -1L, 1L).otherwise(0L))
          .over(wnd))
        .groupBy(col("margin"))
        .agg(max(col("cpos")).as("cpos"), max(col("cneg")).as("cneg"))
      val tot = mTr.agg(
        sum(when(col("y") === -1L, 1L).otherwise(0L))).collect()(0).getLong(0)
      val best = cand
        .withColumn("err",
          lit(nn) * col("cpos") + lit(np) * (lit(tot) - col("cneg")))
        .orderBy(col("err"), col("margin")).limit(1).collect()(0)
      val tau = best.getLong(0)
      println(s"optimal tau=$tau err=${best.getLong(3)}")
      val c = marginsOf(structFeats)
        .select(col("doc_id"), (col("margin") > tau).as("pred"))
        .join(assign.filter(not(col("is_train"))).select(col("doc_id")),
          "doc_id")
        .join(labels, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && col("y") === -1L, 1L).otherwise(0L)).as("fp"),
          sum(when(not(col("pred")) && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
          sum(when(not(col("pred")) && col("y") === -1L, 1L).otherwise(0L)).as("tn"))
        .collect()(0)
      val (n, tp, fp, fn, tn) = (c.getLong(0), c.getLong(1), c.getLong(2),
        c.getLong(3), c.getLong(4))
      println(f"opt-thresh       n=$n tp=$tp fp=$fp fn=$fn tn=$tn " +
        f"acc=${(tp + tn).toDouble / n}%.3f " +
        f"prec=${if (tp + fp == 0) Double.NaN else tp.toDouble / (tp + fp)}%.3f " +
        f"rec=${if (tp + fn == 0) Double.NaN else tp.toDouble / (tp + fn)}%.3f")
    }
    spark.stop()
  }
}
