package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The production shape of the q57 component table: persisted once per
  * corpus version, bucketed on doc_id, and read store-first by every
  * consumer (q57/q83/q120/q127/q129/q134/q136). This spec pins the
  * three claims Dedup.writeComponentsStore's scaladoc makes:
  *
  *  1. store-or-recompute is semantically invisible — the store read
  *     returns exactly the recomputed closure, and a consumer query
  *     (q120's histogram) is bit-identical either way;
  *  2. a consumer joining the store on doc_id gets the store side
  *     co-partitioned from disk with NO shuffle exchange (the
  *     BucketedStoreSpec property, composed with this operator);
  *  3. the conf key only redirects when the named table exists, so a
  *     stale conf cannot silently serve an empty frame.
  */
class ComponentStoreSpec extends SparkSpec {

  test("store-or-recompute: bucketed store read equals the computed closure") {
    val wh = Files.createTempDirectory("graft_wh_comp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS compstore LOCATION '$wh'")
    try {
      val recomputed = Dedup.components(spark, sf001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(recomputed.nonEmpty, "fixture must contain near-dup clusters")

      Dedup.writeComponentsStore(spark, sf001, "compstore.components_b")
      spark.conf.set(Dedup.ComponentsTableConf, "compstore.components_b")
      try {
        val fromStore = Dedup.components(spark, sf001)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(fromStore === recomputed,
          "store read must return exactly the recomputed closure")

        // a real consumer is invariant to the path: q120's cluster-size
        // histogram under the store must equal the recomputed one
        val q120Store = SparkEntry.queries("q120_cluster_hist")(spark, sf001)
          .collect().map(_.toSeq).toSet
        spark.conf.unset(Dedup.ComponentsTableConf)
        val q120Recompute = SparkEntry.queries("q120_cluster_hist")(spark, sf001)
          .collect().map(_.toSeq).toSet
        assert(q120Store === q120Recompute,
          "consumer query must be identical under store and recompute")
      } finally spark.conf.unset(Dedup.ComponentsTableConf)
    } finally spark.sql("DROP DATABASE IF EXISTS compstore CASCADE")
  }

  test("consumer join on doc_id reads the store with no store-side exchange") {
    val wh = Files.createTempDirectory("graft_wh_comp2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS compstore2 LOCATION '$wh'")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      Dedup.writeComponentsStore(spark, sf001, "compstore2.components_b")
      spark.conf.set(Dedup.ComponentsTableConf, "compstore2.components_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      // the consumer shape shared by q127/q134/q136: component table
      // joined to per-doc attributes on doc_id
      val docs = Tables(spark, sf001, "documents")
        .select(col("doc_id"), col("source"))
      val joined = Dedup.components(spark, sf001).join(docs, "doc_id")
      val plan = joined.queryExecution.executedPlan
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.size == 1, s"expected one SMJ on doc_id:\n$plan")
      // components is the LEFT side of the join built above
      val storeExchanges = joins.head.left.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(storeExchanges.isEmpty,
        s"bucketed component store side must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset(Dedup.ComponentsTableConf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP DATABASE IF EXISTS compstore2 CASCADE")
    }
  }

  test("a conf naming a missing table falls back to recompute, not an error") {
    spark.conf.set(Dedup.ComponentsTableConf, "compstore_nope.missing")
    try {
      val comp = Dedup.components(spark, sf001)
      assert(comp.count() > 0, "missing table must fall back to the closure")
    } finally spark.conf.unset(Dedup.ComponentsTableConf)
  }
}
