package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.1–2.4, 2.8, 2.9, 2.10).
  *
  * Each query demonstrates one operator family from the reference
  * inventory, re-expressed as an idiomatic Catalyst plan, with a
  * DuckDB-equivalent oracle. Conventions for oracle parity:
  *   - order-dependent float aggregates (sum/avg/stddev of doubles)
  *     are rounded on BOTH sides; per-row arithmetic is left raw
  *     (identical IEEE expression trees on both engines);
  *   - timestamps are never returned raw (cast to date / epoch);
  *   - window-function outputs are cast to long (DuckDB emits BIGINT).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 grouped aggregation (TPC-H Q1 shape): partial+final hash agg,
    // map-side combine; no shuffle beyond the single groupBy.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // §2.2 filter: compound boolean masks (AND/OR/isin) + comparison
    // predicates; all pushed to the parquet scan.
    "q2_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          (col("l_quantity") > 45 && col("l_returnflag").isin("A", "R")) ||
          (col("l_discount") <= 0.01 && col("l_shipdate") >= lit("2000-01-01").cast("timestamp")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"))
    }),

    // §2.2/§2.5 projection + derived column (with_new_columns analog).
    "q3_select_derived" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("charge"))
    }),

    // §2.2 scalar-in-predicate: reduction evaluated first, substituted
    // into the mask (reference: resolve_mask_scalars). Spark: agg then
    // lit() substitution — one extra job, no shuffle in the main scan.
    "q4_scalar_pred" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val m = l.agg(avg(col("l_quantity"))).first().getDouble(0)
      l.filter(col("l_quantity") > lit(m))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // §2.4 whole-column reductions: mean/std/min/max/sum/median/quantile
    // (reference column/column.py:383-405). median/quantile via exact
    // percentile to match numpy semantics.
    "q5_reductions" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(col("l_quantity")).as("sum_qty"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(stddev_pop(col("l_quantity")), 6).as("std_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"))
    }),

    // §2.8 top-k: sort_by(desc).take(n) → TakeOrderedAndProject (no
    // global sort materialization). Deterministic tie-break on keys.
    "q6_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // §2.8 take_range(start,end) over a sorted view.
    "q7_take_range" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(100).limit(100)
    }),

    // §2.3 idx link (1→0/1): properties→lookup join. The dimension
    // side is NOT hint-forced: customer scales with the corpus
    // (unlike nation/region), so the broadcast decision belongs to
    // Catalyst's size estimate + AQE — auto-broadcast at every test
    // SF, a plain shuffle join past the threshold instead of an OOM.
    "q8_join_lookup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
    }),

    // §2.3 chained dimension joins (star-schema rollup): orders →
    // customer → nation → region; one shuffle (agg). nation/region
    // are CONSTANT-size (25/5 rows) so their hints are always safe;
    // customer scales with the corpus and is left to Catalyst's size
    // estimate (auto-broadcast at test SF, shuffle join at web SF).
    "q9_join_star" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // §2.3 semi-join filter (reference on_galaxies=True →
    // filter_source_by_dataset): LEFT SEMI, no row duplication.
    "q10_semijoin" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // anti-join complement (customers with no qualifying order).
    "q11_antijoin" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.3/§2.6 per-structure aggregation (objects()/evaluate analog):
    // child groupBy on the link key, then join back to parent props.
    "q12_structure_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("n_items"), col("sum_qty"))
    }),

    // §2.9 lightcone-style union (vertical concat of step slices) with
    // downstream agg; unionByName keeps schema alignment explicit.
    "q13_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val early = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val late = o.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      early.unionByName(late)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
    }),

    // §2.9 distinct.
    "q14_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment")).distinct()
    }),

    // §2.10 window: per-group top-n via row_number (take-range-on-sorted
    // semantics inside each structure).
    "q15_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("rn"))
    }),

    // §2.4 histogram (groupBy floor(col/width)) — reference users drop
    // to numpy for this; first-class here.
    "q16_histogram" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // argmax per group (max_by): top order per status.
    "q17_argmax" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("top_orderkey"),
          max(col("o_totalprice")).as("top_price"))
    }),

    // the typed-Aggregator UDAF surface under the driver: weighted
    // mean via WeightedMean (partial+final merge like a built-in).
    // Inputs are INTEGER-VALUED doubles (rounded price, quantity), so
    // every partial sum is exact (< 2^53) and order-independent —
    // hash-comparable without nano-fixed-point machinery.
    "q123_weighted_mean" -> ((s, dir) => {
      val wm = udaf(graft.functions.WeightedMean)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(wm(round(col("l_extendedprice")), col("l_quantity")), 6)
          .as("w_mean_price"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2""",
    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
         FROM lineitem
         WHERE (l_quantity > 45 AND l_returnflag IN ('A','R'))
            OR (l_discount <= 0.01 AND l_shipdate >= TIMESTAMP '2000-01-01')""",
    "q3_select_derived" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
         FROM lineitem""",
    "q4_scalar_pred" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty FROM lineitem
         WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)""",
    "q5_reductions" ->
      """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         sum(l_quantity) AS sum_qty, round(avg(l_quantity), 6) AS avg_qty,
         round(stddev_pop(l_quantity), 6) AS std_qty,
         round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
         round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
         FROM lineitem""",
    "q6_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "q7_take_range" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 100 OFFSET 100""",
    "q8_join_lookup" ->
      """SELECT o_orderkey, o_totalprice, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'""",
    "q9_join_star" ->
      """SELECT r_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1""",
    "q10_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""",
    "q11_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""",
    "q12_structure_agg" ->
      """SELECT o_orderkey, o_orderstatus, count(*) AS n_items,
         sum(l_quantity) AS sum_qty
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1, 2""",
    "q13_union" ->
      """SELECT o_orderstatus, count(*) AS n,
         round(avg(o_totalprice), 4) AS avg_price
         FROM (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
               UNION ALL
               SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1""",
    "q14_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q15_window_rank" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 2""",
    "q16_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
         count(*) AS n FROM orders GROUP BY 1""",
    "q17_argmax" ->
      """SELECT o_orderstatus, arg_max(o_orderkey, o_totalprice) AS top_orderkey,
         max(o_totalprice) AS top_price FROM orders GROUP BY 1""",
    "q123_weighted_mean" ->
      """SELECT l_returnflag,
         round(sum(round(l_extendedprice) * l_quantity) / sum(l_quantity), 6)
           AS w_mean_price
         FROM lineitem GROUP BY 1"""
  )
}
