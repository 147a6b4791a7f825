package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact.{sumFixed, sumFixedSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface: scans, filters, equi/broadcast/semi/anti joins,
  * hash aggregates, SQL window functions, rollup, top-k.
  *
  * The reference itself has no relational surface (it is a stream
  * program, SURVEY.md §2.8), but its keyed-aggregate/join semantics map
  * onto these operators; they are the batch foundation the streaming
  * queries share.
  *
  * Determinism rules for the DuckDB oracle (driver hashes values):
  *  - every double produced by an aggregate is `round(_, N)`-ed on both
  *    sides (summation order differs between engines);
  *  - no timestamp-typed output column — epochs as BIGINT instead
  *    (parquet tz-annotation vs DuckDB naive timestamps);
  *  - every ORDER BY used with LIMIT carries a unique-key tiebreak.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")

  val defs: Seq[QueryDef] = Seq(
    // ---- q1: TPC-H Q1-style full-scan hash aggregate ------------------
    // Partial+final agg (HashAggregateExec) gives map-side combine; at
    // 100 TB this is a single shuffle of ~|groups| rows per partition.
    QueryDef(
      "q1_agg",
      (s, d) =>
        li(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sumFixed("l_quantity"), 2).as("sum_qty"),
            round(sumFixed("l_extendedprice"), 2).as("sum_base"),
            round(sumFixed("l_extendedprice * (1 - l_discount)"), 2).as("sum_disc_price"),
            round(sumFixed("l_quantity") / count(lit(1)), 4).as("avg_qty"),
            count(lit(1)).as("n")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  round(${sumFixedSql("l_quantity")}, 2) AS sum_qty,
              |  round(${sumFixedSql("l_extendedprice")}, 2) AS sum_base,
              |  round(${sumFixedSql("l_extendedprice * (1 - l_discount)")}, 2) AS sum_disc_price,
              |  round(${sumFixedSql("l_quantity")} / count(*), 4) AS avg_qty,
              |  count(*) AS n
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q2: filter + projection (parquet predicate pushdown) ---------
    QueryDef(
      "q2_filter",
      (s, d) =>
        li(s, d)
          .filter(col("l_quantity") > 45 && col("l_returnflag") === "R"
            && col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_returnflag = 'R'
             |  AND l_shipdate >= TIMESTAMP '2000-01-01'""".stripMargin)),

    // ---- q3: TPC-H Q3-style 3-way join + aggregate --------------------
    // customer is tiny relative to lineitem: broadcast it; orders⋈lineitem
    // shuffles on orderkey (the natural co-partitioning key at scale).
    QueryDef(
      "q3_join_agg",
      (s, d) => {
        val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = li(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sumFixed("l_extendedprice * (1 - l_discount)"), 2).as("revenue"))
          .select(col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("o_date"), col("revenue"))
      },
      Some(s"""SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_date,
             |  round(${sumFixedSql("l_extendedprice * (1 - l_discount)")}, 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2""".stripMargin)),

    // ---- q4: EXISTS (left-semi) + aggregate ---------------------------
    QueryDef(
      "q4_semi_agg",
      (s, d) => {
        val bigLines = li(s, d).filter(col("l_quantity") > 48)
          .select(col("l_orderkey")).distinct()
        ord(s, d).join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 48)
             |GROUP BY 1""".stripMargin)),

    // ---- q5: TPC-H Q5-style 6-way join (broadcast dims) ---------------
    QueryDef(
      "q5_multi_join",
      (s, d) => {
        val r = Tables(s, d, "region").filter(col("r_name") === "ASIA")
        val n = Tables(s, d, "nation")
        val sup = Tables(s, d, "supplier")
        val c = cust(s, d)
        val o = ord(s, d)
        val l = li(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sumFixed("l_extendedprice * (1 - l_discount)"), 2).as("revenue"))
      },
      Some(s"""SELECT n_name,
             |  round(${sumFixedSql("l_extendedprice * (1 - l_discount)")}, 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY 1""".stripMargin)),

    // ---- q6: top-k with deterministic tiebreak ------------------------
    QueryDef(
      "q6_topk",
      (s, d) =>
        ord(s, d).select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- q7: distinct --------------------------------------------------
    QueryDef(
      "q7_distinct",
      (s, d) => cust(s, d).select("c_nationkey", "c_mktsegment").distinct(),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),

    // ---- q8: SQL window function (rank-within-partition) ---------------
    QueryDef(
      "q8_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ord(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_custkey
             |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders) WHERE rn <= 3""".stripMargin)),

    // ---- q9: semi join (IN-subquery) -----------------------------------
    QueryDef(
      "q9_semi",
      (s, d) => {
        val big = ord(s, d).filter(col("o_totalprice") > 450000)
          .select(col("o_custkey"))
        cust(s, d).join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders
             |                    WHERE o_totalprice > 450000)""".stripMargin)),

    // ---- q10: anti join -------------------------------------------------
    QueryDef(
      "q10_anti",
      (s, d) =>
        cust(s, d).join(ord(s, d).select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey)""".stripMargin)),

    // ---- q11: union (J4 analog: heterogeneous fan-in) -------------------
    QueryDef(
      "q11_union",
      (s, d) =>
        cust(s, d).select(col("c_name").as("name"), lit("customer").as("kind"))
          .unionByName(
            Tables(s, d, "supplier")
              .select(col("s_name").as("name"), lit("supplier").as("kind"))),
      Some("""SELECT c_name AS name, 'customer' AS kind FROM customer
             |UNION ALL
             |SELECT s_name AS name, 'supplier' AS kind FROM supplier""".stripMargin)),

    // ---- q12: conditional aggregation (P6 flag-agg pattern) -------------
    QueryDef(
      "q12_case_agg",
      (s, d) =>
        ord(s, d).groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
            round(sumFixed("o_totalprice") / count(lit(1)), 2).as("avg_price")),
      Some(s"""SELECT o_orderpriority, count(*) AS n_total,
              |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
              |  round(${sumFixedSql("o_totalprice")} / count(*), 2) AS avg_price
              |FROM orders GROUP BY 1""".stripMargin)),

    // ---- q13: HAVING ----------------------------------------------------
    QueryDef(
      "q13_having",
      (s, d) =>
        cust(s, d).groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 50),
      Some("""SELECT c_nationkey, count(*) AS n FROM customer
             |GROUP BY 1 HAVING count(*) > 50""".stripMargin)),

    // ---- q14: scalar/date/string functions ------------------------------
    QueryDef(
      "q14_scalar",
      (s, d) =>
        ord(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          length(col("o_orderpriority")).as("prio_len")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mo,
             |  upper(substr(o_orderpriority, 1, 3)) AS prio3,
             |  o_orderstatus || '-' || o_orderpriority AS tag,
             |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len
             |FROM orders""".stripMargin)),

    // ---- q16: exact + approximate distinct counting ---------------------
    QueryDef(
      "q16_count_distinct",
      (s, d) =>
        li(s, d).groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_suppkey")).as("nd_supps"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
             |  count(DISTINCT l_suppkey) AS nd_supps, count(*) AS n
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ---- q17: HLL sketch distinct. Engines' sketches differ, so the
    // sketch VALUE has no cross-engine oracle — but its published error
    // bound does: emit the exact count plus a boolean that the sketch
    // landed within 5% of it (integer-only: |approx−exact|·20 ≤ exact,
    // so no float rounding can flip the comparison). The oracle
    // computes the exact count and asserts the bound as literal TRUE;
    // a broken sketch (or a wrong column wired in) now fails the hash
    // gate instead of hiding behind a rows-only check. 5% ≈ 2.5σ at
    // rsd 0.02 — the same ceiling ApproxDistinctSpec has always held.
    // The 100 TB path for distinct counting: constant memory,
    // partial-mergeable.
    QueryDef(
      "q17_approx_distinct",
      (s, d) =>
        li(s, d).groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx") - col("exact_parts")) * lit(20L)
              <= col("exact_parts")).as("within_tol")),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS within_tol
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ---- q18/q19: set operators -----------------------------------------
    QueryDef(
      "q18_intersect",
      (s, d) =>
        cust(s, d).select(col("c_nationkey").as("nk"))
          .intersect(Tables(s, d, "supplier").select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nk FROM supplier""".stripMargin)),
    QueryDef(
      "q19_except",
      (s, d) =>
        cust(s, d).select(col("c_nationkey").as("nk"))
          .except(Tables(s, d, "supplier").select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nk FROM supplier""".stripMargin)),

    // ---- q15: rollup (grouping sets) ------------------------------------
    QueryDef(
      "q15_rollup",
      (s, d) => {
        val j = cust(s, d)
          .join(broadcast(Tables(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
        j.rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n"), round(sumFixed("c_acctbal"), 2).as("bal"))
      },
      Some(s"""SELECT r_name, n_name, count(*) AS n, round(${sumFixedSql("c_acctbal")}, 2) AS bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)),

    // ---- q48: cube (full grouping-set lattice) --------------------------
    // CUBE completes the grouping-sets family (q15 covers ROLLUP):
    // all four (returnflag × linestatus) subtotal combinations in ONE
    // pass — Catalyst expands the lattice with an Expand node feeding
    // a single partial+final hash aggregate, so the fact table is
    // scanned once, not once per grouping set. grouping_id
    // disambiguates "NULL because aggregated" from a null group value.
    QueryDef(
      "q48_cube",
      (s, d) =>
        Tables(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sumFixed("l_quantity"), 2).as("sum_qty"),
            grouping_id().as("gid")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |  round(${sumFixedSql("l_quantity")}, 2) AS sum_qty,
              |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
              |FROM lineitem
              |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- q82: replicate-and-salt skew join ------------------------------
    // q28 salts a skewed AGGREGATE; this is the join-side counterpart
    // for when one probe key carries a disproportionate share of the
    // fact rows (the case AQE's skew-join split also targets — this
    // is the explicit form you reach for when the skew is known ahead
    // of time or AQE's per-partition thresholds can't see it, e.g. a
    // single hot key inside an otherwise-balanced partition). The
    // dimension side is replicated ×4 with an exploded salt column;
    // each fact row picks the deterministic salt l_linenumber % 4, so
    // a hot orderkey's rows spread over 4 reducers instead of one.
    // Identical results to the plain join by construction — exactly
    // what the oracle checks (it runs the UNsalted join).
    QueryDef(
      "q82_salted_join",
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            explode(expr("sequence(0, 3)")).as("salt"))
        val l = Tables(s, d, "lineitem")
          .select(col("l_orderkey"),
            pmod(col("l_linenumber"), lit(4)).as("salt"),
            col("l_extendedprice"), col("l_discount"))
        l.join(o.hint("merge"),
            col("l_orderkey") === col("o_orderkey")
              && l("salt") === o("salt"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sumFixed("l_extendedprice * (1 - l_discount)"), 2)
              .as("revenue"))
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_items,
              |  round(${sumFixedSql("l_extendedprice * (1 - l_discount)")}, 2)
              |    AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1""".stripMargin)),

    // ---- q88: distributed global ranking (two-phase bucket offsets) ----
    // A total rank over the whole table WITHOUT the single-partition
    // sort `row_number() OVER (ORDER BY …)` plans (Spark warns and
    // funnels 100 TB through one task). Two-phase instead, the same
    // scheme as range-partitioned sort: (1) bucket each row by a
    // deterministic coarse split of the sort key (price // 1000 —
    // value-domain buckets, not sampled boundaries, so re-runs and
    // both engines agree bit-for-bit); (2) per-bucket counts — a
    // |buckets|-row aggregate — turn into cumulative offsets with a
    // tiny driver-side window, broadcast back; (3) rank = offset +
    // row_number within bucket, each bucket ranked independently in
    // parallel. One corpus shuffle (the bucket window's exchange);
    // the offsets table is bounded by the value domain, never by the
    // data. Oracle: the single-window formulation DuckDB can afford
    // at sf scale — identical output by construction because the
    // (price DESC, key) order key is unique.
    QueryDef(
      "q88_global_rank",
      (s, d) => {
        val o = ord(s, d).select(col("o_orderkey"), col("o_totalprice"),
          floor(col("o_totalprice") / 1000).cast("long").as("b"))
        // offsets: rows in strictly-higher buckets (rank is descending
        // by price). The window runs on the post-agg |buckets| rows —
        // the "No Partition Defined" plan is fine THERE because the
        // input is bounded by the price domain (~600 rows), not the
        // corpus; the corpus itself never sees a global sort.
        val wOff = Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = o.groupBy(col("b")).agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
          .select(col("b"), col("off"))
        val wIn = Window.partitionBy(col("b"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.join(broadcast(offs), "b")
          .withColumn("price_rank", col("off") + row_number().over(wIn))
          .select(col("o_orderkey"), col("o_totalprice"), col("price_rank"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
             |    AS price_rank
             |FROM orders""".stripMargin)),

    // ---- q99: exact distributed deciles (two-phase selection) -----------
    // Exact order statistics WITHOUT sorting the corpus: q88's
    // value-domain buckets again, but instead of ranking everything,
    // the cumulative bucket counts locate which bucket holds each
    // decile's k-th element (k = ceil(i·N/10)); only rows of the ≤ 10
    // target buckets are ranked (within-bucket, in parallel) and the
    // k-th (o_totalprice, o_orderkey) element is picked exactly.
    // This is the selection-algorithm shape for percentiles at 100 TB
    // — the corpus is scanned once for counts and once for the
    // candidate buckets; nothing is globally sorted. (approx_
    // percentile is the sketch alternative; this one is exact, which
    // is also what lets the oracle hash-match.)
    QueryDef(
      "q99_exact_deciles",
      (s, d) => {
        val o = ord(s, d).select(col("o_orderkey"), col("o_totalprice"),
          floor(col("o_totalprice") / 1000).cast("long").as("b"))
        val wOff = Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = o.groupBy(col("b")).agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
        // N from the bucket counts — NOT o.agg(count): that would be a
        // second corpus aggregation (the q89 lesson); offs is already
        // a |buckets|-row table
        val total = offs.agg(sum(col("bn")).as("n_total"))
        // target global positions k_i = ceil(i·N/10), i = 1..9
        val ks = total.select(explode(expr(
          "transform(sequence(1, 9), i -> " +
            "struct(i AS decile, cast(ceil(i * n_total / 10.0d) as bigint) AS k))"))
          .as("t")).select(col("t.decile").as("decile"), col("t.k").as("k"))
        val targets = ks.join(broadcast(offs),
            col("k") > col("off") && col("k") <= col("off") + col("bn"))
          .select(col("decile"), col("k"), col("b"), col("off"))
        // partition by (b, decile), not b alone: the targets join emits
        // one copy of every bucket row PER decile landing in that
        // bucket, and ranking the duplicated copies together would make
        // row_number arbitrary across identical sort keys whenever two
        // deciles share a bucket — each decile must rank its own full,
        // un-duplicated copy of the bucket
        val wIn = Window.partitionBy(col("b"), col("decile"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        o.join(broadcast(targets), "b")
          .withColumn("rn", row_number().over(wIn))
          .filter(col("rn") === col("k") - col("off"))
          .select(col("decile"), col("o_totalprice").as("value"),
            col("o_orderkey"))
      },
      Some("""WITH r AS (SELECT o_orderkey, o_totalprice,
             |        row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
             |      FROM orders),
             |n AS (SELECT count(*) AS n_total FROM orders),
             |ks AS (SELECT i AS decile,
             |         CAST(ceil(i * n_total / 10.0) AS BIGINT) AS k
             |       FROM n, UNNEST(generate_series(1, 9)) AS g(i))
             |SELECT decile, o_totalprice AS value, o_orderkey
             |FROM ks JOIN r ON r.rn = ks.k""".stripMargin)),

    // ---- q126: one-pass-per-column data-profiling report -----------------
    // The schema-health table every ingest lands behind: per column,
    // row/null/exact-distinct counts and min/max rendered to strings.
    // Plan shape is ONE BRANCH PER COLUMN unioned, not one aggregate
    // with k count(distinct)s: multi-distinct plans through Expand
    // (k× the scan's rows into the shuffle), while each branch here
    // scans ONLY its column (parquet column pruning — ReadSchema is
    // single-field per branch) and partial-aggregates to one row, so
    // the whole report moves k·|distinct| keys and k result rows. On
    // a 100 TB columnar table that is k cheap column scans instead of
    // one k×-amplified shuffle. Timestamps profile as exact integer
    // µs (the engine-wide rule — no engine-formatted timestamp
    // strings); the double column renders through round→DECIMAL so
    // both engines print identical fixed-scale strings.
    QueryDef(
      "q126_profile",
      (s, d) => {
        val ev = Tables(s, d, "events")
        def prof(name: String, v: org.apache.spark.sql.Column,
            fmt: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
            : DataFrame =
          ev.select(v.as("v"))
            .agg(count(lit(1)).as("n_rows"),
              (count(lit(1)) - count(col("v"))).as("n_nulls"),
              countDistinct(col("v")).as("n_distinct"),
              fmt(min(col("v"))).as("min_s"),
              fmt(max(col("v"))).as("max_s"))
            .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_s"), col("max_s"))
        val asStr = (c: org.apache.spark.sql.Column) => c.cast("string")
        val asDec = (c: org.apache.spark.sql.Column) =>
          round(c, 2).cast("decimal(18,2)").cast("string")
        prof("event_id", col("event_id"), asStr)
          .unionAll(prof("ts_us", unix_micros(col("ts")), asStr))
          .unionAll(prof("user_id", col("user_id"), asStr))
          .unionAll(prof("event_type", col("event_type"), asStr))
          .unionAll(prof("value", col("value"), asDec))
          .unionAll(prof("props", col("props"), asStr))
      },
      Some {
        def branch(name: String, v: String, mn: String, mx: String) =
          s"""SELECT '$name' AS col_name, count(*) AS n_rows,
             |  count(*) - count($v) AS n_nulls,
             |  CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
             |  $mn AS min_s, $mx AS max_s
             |FROM events""".stripMargin
        def s(v: String) = branch(v, v,
          s"CAST(min($v) AS VARCHAR)", s"CAST(max($v) AS VARCHAR)")
        Seq(
          s("event_id"),
          branch("ts_us", "epoch_us(ts)",
            "CAST(min(epoch_us(ts)) AS VARCHAR)",
            "CAST(max(epoch_us(ts)) AS VARCHAR)"),
          s("user_id"),
          s("event_type"),
          branch("value", "value",
            "CAST(CAST(round(min(value), 2) AS DECIMAL(18,2)) AS VARCHAR)",
            "CAST(CAST(round(max(value), 2) AS DECIMAL(18,2)) AS VARCHAR)"),
          s("props")
        ).mkString("\nUNION ALL\n")
      }),

    // ---- q132: referential-integrity audit -------------------------------
    // The FK-orphan report an ingest runs before trusting joins: for
    // every foreign-key edge in the star schema, child rows whose key
    // matches no parent (NULL keys count as orphans — they would
    // silently vanish from every inner join downstream). Each edge is
    // one left join against the DISTINCT parent keys (anti-join
    // semantics, one pass, partial-aggregated to a single row): the
    // dimension-side edges broadcast from stats, and the one
    // fact-to-fact edge (lineitem→orders) is the key-keyed shuffle
    // join it would be at 100 TB. LEFT JOIN + NULL-flag rather than
    // NOT IN in the oracle, so the engines share null semantics.
    QueryDef(
      "q132_fk_audit",
      (s, d) => {
        def edge(name: String, child: DataFrame, ck: String,
            parent: DataFrame, pk: String): DataFrame =
          child.select(col(ck).as("k"))
            .join(parent.select(col(pk).as("k"), lit(1).as("hit")).distinct(),
              Seq("k"), "left")
            .agg(count(lit(1)).as("n_rows"),
              sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
            .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
              round(col("n_orphans") / col("n_rows"), 6).as("orphan_rate"))
        val li = Tables(s, d, "lineitem")
        val o = Tables(s, d, "orders")
        val c = Tables(s, d, "customer")
        val su = Tables(s, d, "supplier")
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
          .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
            Tables(s, d, "part"), "p_partkey"))
          .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
            su, "s_suppkey"))
          .unionAll(edge("orders.o_custkey->customer", o, "o_custkey",
            c, "c_custkey"))
          .unionAll(edge("customer.c_nationkey->nation", c, "c_nationkey",
            Tables(s, d, "nation"), "n_nationkey"))
          .unionAll(edge("supplier.s_nationkey->nation", su, "s_nationkey",
            Tables(s, d, "nation"), "n_nationkey"))
      },
      Some {
        def edge(name: String, child: String, ck: String,
            parent: String, pk: String) =
          s"""SELECT '$name' AS fk_edge, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_orphans,
             |  round(CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |        / count(*), 6) AS orphan_rate
             |FROM (SELECT $ck AS k FROM $child) ch
             |LEFT JOIN (SELECT DISTINCT $pk AS k, 1 AS hit FROM $parent) p
             |  USING (k)""".stripMargin
        Seq(
          edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          edge("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          edge("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          edge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey")
        ).mkString("\nUNION ALL\n")
      })
  )
}
