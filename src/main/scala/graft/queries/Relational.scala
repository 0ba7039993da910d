package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Core relational query surface.
  *
  * This is the Spark re-expression of the query capability the reference
  * (dewi-alliance/helium-etl-lite) delegates to Postgres over the schema it
  * maintains (see SURVEY.md §2.4–§2.7): point/range predicates over indexed
  * columns, per-key rollups, joins between the fact and dimension tables.
  * Each query has a matching ANSI-SQL oracle (DuckDB) in [[oracle]]; column
  * names are aliased identically on both sides because the driver's compare
  * sorts columns by name before hashing.
  *
  * Scale design: filters/projections are declarative so Catalyst pushes them
  * into the parquet scan; dimension joins broadcast (region/nation/supplier/
  * part are tiny relative to the fact tables at any SF); fact-fact joins
  * shuffle on their join key only after pushed-down filters shrink inputs.
  * Money aggregates go through exact decimals (order-independent) — see
  * [[graft.Tables.dec]].
  */
object Relational {

  /** T1-analogue predicate + projection; Catalyst pushes both into the scan
    * (reference pushes its `type == "rewards_v2"` dispatch into extraction,
    * /root/reference/src/block_processor.rs:56). */
  private def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))

  /** TPC-H Q1-style pricing summary (reference §2.5 downstream rollups). */
  private def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Broadcast dimension join: lineitem ⋈ part, rollup by brand. `part` is
    * a dimension (200 rows/SF-unit) — explicitly broadcast so the fact table
    * never shuffles (SURVEY §2.4 hash-join mapping of reference S3). */
  private def q03(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sumd(col("l_extendedprice") ).as("brand_revenue"),
        sumd(col("l_quantity")).as("brand_qty"))

  /** Multiway star join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
    * Dimensions broadcast; the only shuffles are fact-side joins on
    * o_orderkey/o_custkey — at 100 TB this is the canonical star-schema
    * plan (broadcast the dim chain, shuffle facts once, AQE coalesces). */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val dims = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
    orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Left-semi join — the Spark form of the reference's allowlist membership
    * filter (T6, /root/reference/src/block_processor.rs:80-121): orders that
    * have at least one high-quantity lineitem. Semi-join (not inner+distinct)
    * so the probe side is never duplicated, mirroring the reference's
    * once-only `continue 'rloop` semantics. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val bigLines = lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"))
    orders(s, d)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumd(col("o_totalprice")).as("sum_price"))
  }

  /** Left-anti join: customers with no high-value orders (NOT EXISTS). The
    * anti side's filter is pushed into its scan before the join. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 300000)
    customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Outer join + null-sentinel coalesce — T4 parity: the reference maps
    * absent account/gateway to the literal "1Wh4bh"
    * (/root/reference/src/reward.rs:21-33, README.md:111). Here customers
    * without orders get the sentinel as their priority bucket. */
  private def q07(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("o_orderpriority"), lit("1Wh4bh")).as("prio_bucket"))
      .groupBy(col("prio_bucket"))
      .agg(count(lit(1)).as("n_rows"))

  /** Window top-N: top 3 orders per customer by price (deterministic
    * tie-break on o_orderkey). Partition-local sort after a single shuffle
    * on c_custkey; no global sort. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
  }

  /** Global sort + limit (top-K). Spark executes this as TakeOrderedAndProject
    * — per-partition top-K then a single driver merge, no full sort of the
    * fact table; scales as O(n log k) per partition at 100 TB. */
  private def q09(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** Distinct aggregation: exact distinct counts per group (expands to a
    * two-phase aggregate; the partial phase is map-side so the shuffle
    * carries only distinct (group, key) pairs). */
  private def q10(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))

  /** Hierarchical rollup (region → nation → ALL): Spark `rollup` ≡ SQL
    * GROUP BY ROLLUP; rollup nulls labelled via coalesce (names are
    * non-null in data). Partial aggregation keeps the shuffle small. */
  private def q15(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumd(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"), col("sum_bal"))

  /** Aggregate + HAVING: suppliers shipping above-threshold quantity. */
  private def q16(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sumd(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 14000)

  /** Correlated-subquery analogue: customers above their nation's average
    * balance. Re-expressed as a broadcast join against the per-nation
    * aggregate; the comparison is `bal * cnt > sum` so both engines compare
    * identical doubles (no division, no rounding). */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val natAgg = customer(s, d)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sumd(col("c_acctbal")).as("nat_sum"), count(lit(1)).as("nat_cnt"))
    customer(s, d)
      .join(broadcast(natAgg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") * col("nat_cnt") > col("nat_sum"))
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
  }

  /** Set operations: nations that have customers but no suppliers
    * (EXCEPT), plus the INTERSECT count as a second column view. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val custNations = customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    custNations.except(suppNations)
      .unionAll(custNations.intersect(suppNations)
        .withColumn("nationkey", col("nationkey") + 1000))
  }

  /** Conditional (pivot-style) aggregation over order status. */
  private def q19(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("price_f"))

  /** Scalar string-function battery (§2.7): substr/upper/length/concat
    * pushed through codegen, aggregated per language. */
  private def q20(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        max(length(col("text"))).cast("long").as("max_len"),
        min(upper(substring(col("text"), 1, 8))).as("min_prefix"),
        countDistinct(concat(col("source"), lit("#"), col("lang"))).as("n_src_lang"))

  /** Full cube over two dims (§2.5 "cube/rollup built in"). */
  private def q21(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))

  /** HLL approximate distinct (§2.5), externally gated as a BOUND
    * CERTIFICATE: the raw estimate is engine-specific (no cross-engine
    * oracle can hash it), so the query emits what IS deterministic —
    * the exact distinct count and a boolean certifying the HLL estimate
    * landed within 5% of it (5σ at rsd=0.01; deterministic-true for a
    * correct sketch). DuckDB reproduces the exact count and the literal
    * TRUE; a broken sketch flips the flag and fails the hash gate. The
    * exact countDistinct is the audit cost of the certificate — a
    * production caller at 100 TB runs the sketch alone. */
  private def q22(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_orders"), col("n_rows"),
        (abs(col("approx") - col("exact_orders")).cast("double") <=
          col("exact_orders").cast("double") * 0.05).as("within_5pct"))

  /** Equi + range join (§2.4 range row): lineitems shipped within 30 days
    * of their order's date. The equi key (orderkey) carries the shuffle;
    * the range predicate evaluates post-match — no nested-loop explosion. */
  private def q23(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_quick_ships"),
        sumd(col("l_extendedprice")).as("quick_revenue"))

  /** Salted two-phase aggregation exposed through the gate: identical
    * result to a plain groupBy (the oracle IS the plain SQL), computed via
    * [[graft.operators.Salting]] — the skew path stays semantics-exact.
    * Value goes through decimal so partial sums are order-independent. */
  private def q25(s: SparkSession, d: String): DataFrame =
    graft.operators.Salting.saltedSumCount(
      lineitem(s, d), "l_suppkey", dec(col("l_quantity")), "sum_qty", 8)
      .select(col("l_suppkey"), col("sum_qty").cast("double").as("sum_qty"),
        col("n_rows"))

  /** Aggregation to a sorted array (collect_list is unordered by contract;
    * sort_array pins it) — emitted as a joined string for byte-stable
    * comparison. */
  private def q26(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(concat_ws("|", sort_array(collect_list(col("s_name"))))
        .as("suppliers"),
        count(lit(1)).as("n_supp"))

  /** Exact string edit distance (levenshtein is bit-identical across
    * engines) between consecutive sampled documents — the character-level
    * face of the dedup suite. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val sample = documents(s, d).filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text"))
    val a = sample.select(col("doc_id").as("a_id"), col("text").as("a_text"))
    val b = sample.select(col("doc_id").as("b_id"), col("text").as("b_text"))
    a.join(b, col("b_id") === col("a_id") + 100)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_text"), col("b_text")).cast("long").as("edit_dist"),
        (length(col("a_text")) + length(col("b_text"))).cast("long").as("len_sum"))
  }

  /** Deterministic stratified sample: ~10% of orders per priority stratum,
    * selected by an MD5-derived hash of the key (not `rand()` — the sample
    * must be reproducible across engines, runs, and cluster sizes, which is
    * exactly what a training-data pipeline needs for holdout splits). The
    * hash predicate is a pure per-row filter ahead of the aggregate, so at
    * 100 TB it prunes 90% of rows before any shuffle. */
  private def q35(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(graft.functions.Portable.hash60(
        col("o_orderkey").cast("string"), 777) % 1000 < 100)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sumd(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))

  /** Correlated EXISTS subquery through the SQL surface — exercises
    * Catalyst's subquery decorrelation (RewriteSubquery rewrites the
    * correlated EXISTS into a left-semi join; q05 is the hand-written
    * equivalent). The oracle runs the IDENTICAL ANSI SQL, so this also
    * pins the SQL-entry-point parity the reference's Postgres consumers
    * would rely on. */
  private def q40(s: SparkSession, d: String): DataFrame = {
    graft.Catalog.registerAll(s, d)
    s.sql(
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)""".stripMargin)
  }

  /** Bag-semantics set operations — EXCEPT ALL / INTERSECT ALL keep
    * MULTIPLICITY (q18 covers the set-semantics forms): the multiset of
    * customer nations minus the supplier nations' multiset, unioned with
    * the intersection's multiset (tagged). Spark plans both as aggregate
    * + generate (count difference replication), one shuffle each. */
  private def q41(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nationkey"))
    val sup = supplier(s, d).select(col("s_nationkey").as("nationkey"))
    c.exceptAll(sup).withColumn("op", lit("except_all"))
      .unionAll(c.intersectAll(sup).withColumn("op", lit("intersect_all")))
  }

  /** Join-key skew report — the observability that feeds the
    * salt-or-not decision (q25/q37): per candidate join key, distinct key
    * count, total rows, the hottest key's row count, and its per-mille
    * share. Two-level aggregation per key column; each is one shuffle on
    * the key then a scalar rollup. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    def keyStats(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_key_rows"))
        .select(lit(key).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_key_rows"),
          expr("(1000L * max_key_rows) DIV n_rows").as("top1_pm"))
    keyStats(lineitem(s, d), "l_suppkey")
      .unionAll(keyStats(lineitem(s, d), "l_orderkey"))
      .unionAll(keyStats(orders(s, d), "o_custkey"))
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_filter_project" -> q01 _,
    "q02_agg_pricing_summary" -> q02 _,
    "q03_join_broadcast_brand" -> q03 _,
    "q04_star_join_revenue" -> q04 _,
    "q05_semi_join_allowlist" -> q05 _,
    "q06_anti_join_no_orders" -> q06 _,
    "q07_outer_join_sentinel" -> q07 _,
    "q08_window_topn_per_cust" -> q08 _,
    "q09_sort_limit_topk" -> q09 _,
    "q10_distinct_agg" -> q10 _,
    "q15_rollup_region_nation" -> q15 _,
    "q16_having_threshold" -> q16 _,
    "q17_above_nation_avg" -> q17 _,
    "q18_setops_nations" -> q18 _,
    "q19_conditional_agg" -> q19 _,
    "q20_string_funcs" -> q20 _,
    "q21_cube_status_priority" -> q21 _,
    "q22_approx_distinct" -> q22 _,
    "q23_range_join_shipwindow" -> q23 _,
    "q25_salted_agg" -> q25 _,
    "q26_collect_sorted" -> q26 _,
    "q27_edit_distance" -> q27 _,
    "q35_stratified_sample" -> q35 _,
    "q40_exists_subquery" -> q40 _,
    "q41_bag_setops" -> q41 _,
    "q45_skew_report" -> q45 _,
  )

  val oracle: ListMap[String, String] = ListMap(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45""".stripMargin,
    "q02_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumd("l_quantity")} AS sum_qty,
         |  ${sqlSumd("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_broadcast_brand" ->
      s"""SELECT p_brand, COUNT(*) AS n_items,
         |  ${sqlSumd("l_extendedprice")} AS brand_revenue,
         |  ${sqlSumd("l_quantity")} AS brand_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,
    "q04_star_join_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_semi_join_allowlist" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  ${sqlSumd("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         |GROUP BY o_orderpriority""".stripMargin,
    "q06_anti_join_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q07_outer_join_sentinel" ->
      """SELECT COALESCE(o_orderpriority, '1Wh4bh') AS prio_bucket,
        |  COUNT(*) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY COALESCE(o_orderpriority, '1Wh4bh')""".stripMargin,
    "q08_window_topn_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q09_sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_rollup_region_nation" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
         |  COALESCE(n_name, 'ALL') AS nation_name,
         |  COUNT(*) AS n_cust, ${sqlSumd("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q16_having_threshold" ->
      s"""SELECT l_suppkey, ${sqlSumd("l_quantity")} AS total_qty,
         |  COUNT(*) AS n_lines
         |FROM lineitem GROUP BY l_suppkey
         |HAVING ${sqlSumd("l_quantity")} > 14000""".stripMargin,
    "q17_above_nation_avg" ->
      s"""WITH nat AS (
         |  SELECT c_nationkey AS nk, ${sqlSumd("c_acctbal")} AS nat_sum,
         |    COUNT(*) AS nat_cnt
         |  FROM customer GROUP BY c_nationkey)
         |SELECT c_custkey, c_acctbal, c_nationkey
         |FROM customer JOIN nat ON c_nationkey = nk
         |WHERE c_acctbal * nat_cnt > nat_sum""".stripMargin,
    "q18_setops_nations" ->
      """SELECT nationkey FROM (
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   EXCEPT
        |   SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |  UNION ALL
        |  SELECT nationkey + 1000 AS nationkey FROM
        |    (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |     INTERSECT
        |     SELECT DISTINCT s_nationkey AS nationkey FROM supplier))""".stripMargin,
    "q19_conditional_agg" ->
      """SELECT o_orderpriority,
        |  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
        |  SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
        |  SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS price_f
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q20_string_funcs" ->
      """SELECT lang, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS sum_chars,
        |  MAX(LENGTH(text)) AS max_len,
        |  MIN(UPPER(SUBSTRING(text, 1, 8))) AS min_prefix,
        |  COUNT(DISTINCT source || '#' || lang) AS n_src_lang
        |FROM documents GROUP BY lang""".stripMargin,
    "q21_cube_status_priority" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n_orders, ${sqlSumd("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    // q22: the HLL estimate itself is engine-specific; the oracle gates
    // the bound certificate — exact count + the within-bound TRUE the
    // Spark side must reproduce from its live sketch.
    "q22_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  COUNT(*) AS n_rows,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q23_range_join_shipwindow" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_quick_ships,
         |  ${sqlSumd("l_extendedprice")} AS quick_revenue
         |FROM lineitem JOIN orders
         |  ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY o_orderpriority""".stripMargin,
    "q25_salted_agg" ->
      s"""SELECT l_suppkey, ${sqlSumd("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q26_collect_sorted" ->
      """SELECT n_name,
        |  array_to_string(list_sort(list(s_name)), '|') AS suppliers,
        |  COUNT(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q27_edit_distance" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  levenshtein(a.text, b.text) AS edit_dist,
        |  LENGTH(a.text) + LENGTH(b.text) AS len_sum
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 100
        |WHERE a.doc_id % 100 = 0 AND b.doc_id % 100 = 0""".stripMargin,
    "q35_stratified_sample" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_sampled,
         |  ${sqlSumd("o_totalprice")} AS sum_price,
         |  MIN(o_orderkey) AS min_key,
         |  MAX(o_orderkey) AS max_key
         |FROM orders
         |WHERE ${graft.functions.Portable.sqlHash60("o_orderkey::VARCHAR", 777)} % 1000 < 100
         |GROUP BY o_orderpriority""".stripMargin,
    "q40_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)""".stripMargin,
    "q41_bag_setops" ->
      """SELECT nationkey, 'except_all' AS op FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'intersect_all' AS op FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier)""".stripMargin,
    "q45_skew_report" ->
      """WITH s1 AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
        |s2 AS (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey),
        |s3 AS (SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey)
        |SELECT 'l_suppkey' AS key_col, COUNT(*) AS n_keys,
        |  SUM(c)::BIGINT AS n_rows, MAX(c) AS max_key_rows,
        |  ((1000 * MAX(c)) // SUM(c))::BIGINT AS top1_pm FROM s1
        |UNION ALL
        |SELECT 'l_orderkey', COUNT(*), SUM(c)::BIGINT, MAX(c),
        |  ((1000 * MAX(c)) // SUM(c))::BIGINT FROM s2
        |UNION ALL
        |SELECT 'o_custkey', COUNT(*), SUM(c)::BIGINT, MAX(c),
        |  ((1000 * MAX(c)) // SUM(c))::BIGINT FROM s3""".stripMargin,
  )
}
