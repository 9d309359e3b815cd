package graft.operators

import graft.{GQuery, Tables}
import graft.GQuery._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational / query core (SURVEY.md §2.A).
  *
  * The reference's query surface is registry lookup + selection
  * (/root/reference/marda_extractors_api/__init__.py:96-123); a general
  * analytics engine needs the full relational algebra underneath, expressed
  * declaratively so Catalyst plans pushdown / broadcast / partial
  * aggregation. Every query here is scale-oblivious: no collect(), no
  * driver-side loops, dims broadcast, facts shuffled at most once.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val all: Seq[GQuery] = Seq(

    // ── q01: TPC-H Q1 shape — multi-aggregate with map-side partial agg. ──
    GQuery("q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" <= lit("2000-09-02"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sumd(d2($"l_quantity")).as("sum_qty"),
            sumd(d2($"l_extendedprice")).as("sum_base_price"),
            sumd(d2($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - r2($"l_discount"))).as("sum_disc_price"),
            sumd(d2($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - r2($"l_discount"))
              * (lit(1).cast(DecimalType(3, 2)) + r2($"l_tax"))).as("sum_charge"),
            (sum(d2($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
            (sum(d2($"l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
            (sum(r2($"l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      // decimal→double on the ORACLE side goes through VARCHAR: DuckDB's
      // direct DECIMAL→DOUBLE computes int128/10^scale in floating point
      // and is off by 1 ulp once the sum passes ~15 significant digits
      // (sum_charge crossed that at the sf1 sweep: ...256.93967 vs
      // ...256.939674), while both Spark's Decimal.toDouble and DuckDB's
      // string parser are correctly rounded — the decimal STRING is the
      // engine-neutral exact value (§6 discipline, now for sums too)
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ── q02: filter + projection pushdown — scan reads 5 of 11 columns, ──
    // predicates reach the parquet reader (PushedFilters in explain).
    GQuery("q02_filter_pushdown",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" >= lit("1997-01-01") && $"l_shipdate" < lit("1997-02-01")
            && $"l_discount" >= 0.05 && $"l_quantity" > 45)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            (d2($"l_extendedprice") * r2($"l_discount")).cast(DoubleType).as("disc_value"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc_value
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
          AND l_discount >= 0.05 AND l_quantity > 45
        ORDER BY l_orderkey, l_linenumber""")),

    // ── q03: dim joins broadcast — fact side never shuffles. ──
    GQuery("q03_broadcast_join",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), $"o_custkey" === $"c_custkey")
          .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("order_count"), sumd(d2($"o_totalprice")).as("total_spend"))
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name, COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ── q04: large⋈large shuffle join (lineitem⋈orders on orderkey), ──
    // sort-merge under AQE; aggregation after the join is partial-agg'd.
    GQuery("q04_shuffle_join",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority", year($"o_orderdate").as("order_year"))
          .agg(count(lit(1)).as("n_lines"),
            sumd(d2($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - r2($"l_discount"))).as("revenue"))
          .orderBy($"o_orderpriority", $"order_year")
      },
      Some("""
        SELECT o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority, order_year
        ORDER BY o_orderpriority, order_year""")),

    // ── q05: 5-way star join (Q5 shape): one fact shuffle, all dims ──
    // broadcast; supplier-nation = customer-nation equi-constraint.
    GQuery("q05_star_join",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(t(s, d, "customer")), $"o_custkey" === $"c_custkey")
          .join(broadcast(t(s, d, "supplier")),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
          .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
          .groupBy($"r_name", $"n_name")
          .agg(sumd(d2($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - r2($"l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ── q06: semi join (EXISTS) — no duplication, no payload columns ──
    // moved for the probe side.
    GQuery("q06_semi_join",
      (s, d) => {
        import s.implicits._
        val urgent = t(s, d, "orders").filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        t(s, d, "customer")
          .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ── q07: anti join (NOT EXISTS). ──
    GQuery("q07_anti_join",
      (s, d) => {
        import s.implicits._
        val urgent = t(s, d, "orders").filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        t(s, d, "customer")
          .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ── q08: outer join + two-level aggregation (Q13 shape): customer ──
    // order-count distribution including zero-order customers.
    GQuery("q08_outer_join_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "customer")
          .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"c_count")
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY c_count ORDER BY c_count""")),

    // ── q09: top-N per group via ranking window (single shuffle on the ──
    // partition key; deterministic orderkey tiebreak).
    GQuery("q09_window_topk",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderpriority", $"rn")
      },
      Some("""
        SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),

    // ── q10: running-total window frame (exact decimal running sum so ──
    // both engines' frame evaluation orders agree bit-for-bit).
    GQuery("q10_window_running",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders").filter($"o_custkey" < 50)
          .select($"o_custkey", $"o_orderkey",
            sum(d2($"o_totalprice")).over(w).cast(DoubleType).as("running_spend"),
            lag($"o_orderkey", 1).over(
              Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)).as("prev_orderkey"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
        FROM orders WHERE o_custkey < 50
        ORDER BY o_custkey, o_orderkey""")),

    // ── q11: exact distinct aggregation (expand+2-phase partial agg). ──
    GQuery("q11_distinct_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(countDistinct($"o_custkey").as("n_customers"), count(lit(1)).as("n_orders"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q12: global top-k — TakeOrderedAndProject (per-partition top-k ──
    // then driver merge of k×partitions rows, never a full sort).
    GQuery("q12_topk_orderby",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(20)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""")),

    // ── q13: pivot with pre-listed values — single shuffle, no extra ──
    // pass to discover the pivot domain.
    GQuery("q13_pivot",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"day")
      },
      Some("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY day ORDER BY day""")),

    // ── q14: union + distinct (shuffle-dedup). ──
    GQuery("q14_union_dedup",
      (s, d) => {
        import s.implicits._
        t(s, d, "customer").select($"c_nationkey".as("nationkey"))
          .union(t(s, d, "supplier").select($"s_nationkey".as("nationkey")))
          .distinct()
          .orderBy($"nationkey")
      },
      Some("""
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier)
        ORDER BY nationkey""")),

    // ── q15: HAVING — post-aggregation filter. ──
    GQuery("q15_having_group",
      (s, d) => {
        import s.implicits._
        t(s, d, "part")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"),
            (sum($"p_size").cast(DoubleType) / count(lit(1))).as("avg_size"))
          .filter($"n_parts" >= 5)
          .orderBy($"p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_parts,
               CAST(CAST(SUM(p_size) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_size
        FROM part GROUP BY p_brand HAVING COUNT(*) >= 5 ORDER BY p_brand""")),

    // ── q16: rollup / grouping sets (nulls folded to 'ALL' sentinel so ──
    // cross-engine null ordering can't diverge).
    GQuery("q16_rollup",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sumd(d2($"o_totalprice")).as("total_spend"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n_orders", $"total_spend")
          .orderBy($"status", $"priority")
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ── q17: string functions (all codegen'd, no UDFs). ──
    GQuery("q17_string_funcs",
      (s, d) => {
        import s.implicits._
        t(s, d, "part")
          .select($"p_partkey",
            upper($"p_name").as("name_upper"),
            length($"p_name").as("name_len"),
            substring($"p_type", 1, 3).as("type_prefix"),
            concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
            regexp_replace($"p_name", "[aeiou]", "").as("name_novowels"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey, UPPER(p_name) AS name_upper,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               SUBSTRING(p_type, 1, 3) AS type_prefix,
               CONCAT(p_brand, '|', p_type) AS brand_type,
               REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels
        FROM part ORDER BY p_partkey""")),

    // ── q18: calendar bucketing (month granularity, string-keyed for ──
    // cross-engine temporal parity).
    GQuery("q18_date_trunc_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month"))
          .agg(count(lit(1)).as("n_orders"), sumd(d2($"o_totalprice")).as("total_spend"))
          .orderBy($"order_month")
      },
      Some("""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY order_month ORDER BY order_month""")),

    // ── q19: semi-structured JSON extraction from the events stream. ──
    GQuery("q19_json_extract",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .select($"event_type", get_json_object($"props", "$.k").cast(IntegerType).as("k"),
            $"value")
          .groupBy($"event_type", ($"k" % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), sumd(d2($"value")).as("value_sum"))
          .orderBy($"event_type", $"k_bucket")
      },
      Some("""
        SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY event_type, k_bucket ORDER BY event_type, k_bucket""")),

    // ── q20: array explode: corpus word frequencies (partial agg keeps ──
    // the exploded shuffle small).
    GQuery("q20_explode_tokens",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select(explode(split($"text", " ")).as("word"))
          .filter($"word" =!= "")
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"word")
      },
      Some("""
        SELECT word, COUNT(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word ORDER BY word""")),

    // ── q21: exact interpolated percentiles per group. ──
    GQuery("q21_percentile",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            roundz(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            roundz(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               (ROUND(quantile_cont(o_totalprice, 0.5), 4) + 0.0) AS p50,
               (ROUND(quantile_cont(o_totalprice, 0.9), 4) + 0.0) AS p90,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ── q22: SQL API over temp views, multi-CTE (top spender per ──
    // nation via windowed CTE chain).
    GQuery("q22_sql_cte",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("g_orders")
        t(s, d, "customer").createOrReplaceTempView("g_customer")
        t(s, d, "nation").createOrReplaceTempView("g_nation")
        s.sql("""
          WITH spend AS (
            SELECT c_nationkey, c_custkey, c_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
            FROM g_orders JOIN g_customer ON o_custkey = c_custkey
            GROUP BY c_nationkey, c_custkey, c_name),
          ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY total_spend DESC, c_custkey ASC) AS rn
            FROM spend)
          SELECT n_name, c_custkey, c_name, total_spend
          FROM ranked JOIN g_nation ON c_nationkey = n_nationkey
          WHERE rn = 1 ORDER BY n_name""")
      },
      Some("""
        WITH spend AS (
          SELECT c_nationkey, c_custkey, c_name,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey, c_custkey, c_name),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                     ORDER BY total_spend DESC, c_custkey ASC) AS rn
          FROM spend)
        SELECT n_name, c_custkey, c_name, total_spend
        FROM ranked JOIN nation ON c_nationkey = n_nationkey
        WHERE rn = 1 ORDER BY n_name""")),

    // ── q23: scalar subquery threshold (exact-decimal mean so the ──
    // comparison boundary is identical across engines); the 1-row agg is
    // broadcast, not recomputed per row.
    GQuery("q23_scalar_subquery",
      (s, d) => {
        import s.implicits._
        val orders = t(s, d, "orders")
        val thr = orders.agg(
          (sum(d2($"o_totalprice")).cast(DoubleType) / count(lit(1)) * 1.5).as("thr"))
        orders.join(broadcast(thr))
          .filter($"o_totalprice" > $"thr")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) * 1.5 FROM orders)
        ORDER BY o_orderkey""")),

    // ── q24: HLL approximate distinct — sketch-based, constant memory ──
    // at any scale. The estimate itself is engine-specific (no engine-
    // portable value), so the oracle-checkable spelling emits the EXACT
    // distinct count plus a `within_bound` flag asserting the HLL
    // estimate landed inside 3·rsd of it — DuckDB mirrors the exact
    // count and `TRUE` for the flag, making the row hash-checkable. The
    // exact count_distinct is the TEST arm only: the operator under
    // test is the sketch, and at 100 TB you run the sketch alone (one
    // map-combined pass, ~1.5 KB of state per group vs a full distinct
    // shuffle for the exact arm).
    GQuery("q24_approx_distinct",
      (s, d) => {
        import s.implicits._
        val rsd = 0.02
        t(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey", rsd).as("approx_parts"),
            count_distinct($"l_partkey").as("exact_parts"),
            count(lit(1)).as("n"))
          .select($"l_returnflag", $"exact_parts", $"n",
            (abs($"approx_parts" - $"exact_parts").cast(DoubleType)
              <= lit(3 * rsd) * $"exact_parts").as("within_bound"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(*) AS n,
               TRUE AS within_bound
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // ── q25: set operations — INTERSECT / EXCEPT as shuffle-dedup set ──
    // algebra over nation keys.
    GQuery("q25_set_ops",
      (s, d) => {
        import s.implicits._
        val cn = t(s, d, "customer").select($"c_nationkey".as("nationkey"))
        val sn = t(s, d, "supplier").select($"s_nationkey".as("nationkey"))
        cn.intersect(sn).withColumn("tag", lit("both"))
          .union(cn.except(sn).withColumn("tag", lit("cust_only")))
          .orderBy($"tag", $"nationkey")
      },
      Some("""
        SELECT * FROM (
          SELECT nationkey, 'both' AS tag FROM
            (SELECT c_nationkey AS nationkey FROM customer
             INTERSECT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT nationkey, 'cust_only' AS tag FROM
            (SELECT c_nationkey AS nationkey FROM customer
             EXCEPT SELECT s_nationkey FROM supplier))
        ORDER BY tag, nationkey""")),

    // ── q26: string-similarity self-join — Levenshtein ≤ 8 within brand ──
    // blocks (blocking bounds the pairwise work, same discipline as the
    // LSH dedup family).
    GQuery("q26_string_similarity",
      (s, d) => {
        import s.implicits._
        val p = t(s, d, "part").filter($"p_partkey" < 300)
          .select($"p_partkey", $"p_brand", $"p_name")
        p.as("x").join(p.as("y"),
            $"x.p_brand" === $"y.p_brand" && $"x.p_partkey" < $"y.p_partkey")
          .select($"x.p_partkey".as("i"), $"y.p_partkey".as("j"),
            levenshtein($"x.p_name", $"y.p_name").as("lev"))
          .filter($"lev" <= 8)
          .orderBy($"i", $"j")
      },
      Some("""
        SELECT x.p_partkey AS i, y.p_partkey AS j,
               CAST(levenshtein(x.p_name, y.p_name) AS INT) AS lev
        FROM (SELECT * FROM part WHERE p_partkey < 300) x
        JOIN (SELECT * FROM part WHERE p_partkey < 300) y
          ON x.p_brand = y.p_brand AND x.p_partkey < y.p_partkey
        WHERE levenshtein(x.p_name, y.p_name) <= 8
        ORDER BY i, j""")),

    // ── q27: FILTER-clause aggregates (conditional aggregation in one ──
    // pass, no self-joins).
    GQuery("q27_filtered_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
            count(when($"o_orderstatus" === "O", 1)).as("n_open"),
            sumd(when($"o_orderstatus" === "F", d2($"o_totalprice"))).as("spend_finished"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS spend_finished
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q28: salted two-stage aggregation — the skew-mitigation pattern ──
    // for hot keys: stage 1 aggregates on (key, salt) so a hot key's rows
    // spread over 8 reducers, stage 2 merges the partials. Result is
    // salt-independent (decimal addition is associative/exact), so the
    // oracle is the plain GROUP BY. l_returnflag has 3 values over 600k
    // rows at sf0.1 — exactly the shape that melts a single reducer at
    // 100 TB without salting.
    GQuery("q28_salted_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .withColumn("salt", pmod(hash($"l_orderkey"), lit(8)))
          .groupBy($"l_returnflag", $"salt")
          .agg(count(lit(1)).as("pn"),
            sum(d2($"l_quantity")).as("pq"),
            sum(d2($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - r2($"l_discount"))).as("pr"))
          .groupBy($"l_returnflag")
          .agg(sum($"pn").as("n"),
            sum($"pq").cast(DoubleType).as("sum_qty"),
            sum($"pr").cast(DoubleType).as("revenue"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q29: correlated subquery — orders above their own customer's ──
    // average, decorrelated into a window (one shuffle on the correlation
    // key; the exact-decimal mean makes the comparison boundary identical
    // across engines).
    GQuery("q29_correlated_subquery",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
        t(s, d, "orders")
          .withColumn("cust_avg",
            sum(d2($"o_totalprice")).over(w).cast(DoubleType) / count(lit(1)).over(w))
          .filter($"o_totalprice" > $"cust_avg")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"cust_avg")
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
          FROM orders)
        WHERE o_totalprice > cust_avg
        ORDER BY o_orderkey""")),

    // ── q30: dispersion statistics from exact decimal moments — mean, ──
    // sample variance, stddev derived from Σx and Σx² (exact decimal sums,
    // then a fixed-order double formula: bit-identical across engines,
    // unlike streaming variance accumulators whose merge order varies).
    GQuery("q30_dispersion",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(d2($"o_totalprice")).as("sx"),
            sum(d2($"o_totalprice") * d2($"o_totalprice")).as("sx2"))
          // Decimal→double via STRING: decimal→text is exact and
          // text→double is correctly rounded in both engines, so the
          // doubles are bit-identical — DuckDB's direct decimal→double
          // (scaled multiply) drifts 1-3 ulp on 19-digit moments, and
          // round() can't paper over that (it disagrees cross-engine at
          // .xxxx5 boundaries, which 2-dp money hits in practice).
          .select(Seq($"o_orderpriority", $"n") ++ {
            val sxd = $"sx".cast(StringType).cast(DoubleType)
            val sx2d = $"sx2".cast(StringType).cast(DoubleType)
            val variance = (sx2d - sxd * sxd / $"n") / ($"n" - 1)
            Seq((sxd / $"n").as("mean"), variance.as("var_samp"), sqrt(variance).as("stddev"))
          }: _*)
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, n,
               sx / n AS mean,
               (sx2 - sx * sx / n) / (n - 1) AS var_samp,
               sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev
        FROM (
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)) * CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx2
          FROM orders GROUP BY o_orderpriority)
        ORDER BY o_orderpriority""")),

    // ── q31: value-based (RANGE) window frame — 7-day trailing spend per ──
    // customer. Range frames are peer-inclusive, so duplicate order dates
    // stay deterministic without a tiebreak; exact decimal running sums.
    GQuery("q31_range_frame",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val day = datediff($"o_orderdate", lit("1995-01-01"))
        val w = Window.partitionBy($"o_custkey").orderBy(day)
          .rangeBetween(-6, Window.currentRow)
        t(s, d, "orders").filter($"o_custkey" < 200)
          .select($"o_orderkey", $"o_custkey", day.as("day"),
            sum(d2($"o_totalprice")).over(w).cast(DoubleType).as("trailing_7d_spend"),
            count(lit(1)).over(w).as("trailing_7d_orders"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS trailing_7d_spend,
               COUNT(*) OVER w AS trailing_7d_orders
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey""")),

    // ── q32: multiple distinct aggregates in one pass — Catalyst's ──
    // Expand-based rewrite computes all three distinct sets in a single
    // shuffle instead of three self-joins.
    GQuery("q32_multi_distinct",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_orderkey").as("n_orders"),
            countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q33: CUBE grouping sets — all 4 grouping combinations in one ──
    // Expand+aggregate pass (q16's rollup emits only the 3 hierarchical
    // ones); grouping_id disambiguates a genuine NULL group from a
    // CUBE-generated ALL row. Same two-phase aggregate as q01: the
    // Expand multiplies rows 4× BEFORE the partial agg, so the shuffle
    // still carries one row per (grouping set × group), not per input.
    GQuery("q33_cube",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().cast(LongType).as("gid"),
            count(lit(1)).as("n_orders"),
            sumd(d2($"o_totalprice")).as("total_spend"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"gid", $"n_orders", $"total_spend")
          .orderBy($"gid", $"status", $"priority")
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, status, priority""")),

    // ── q34: NTILE decile statistics — equal-frequency bucketing of ──
    // customers by balance WITHIN each market segment. The partitionBy
    // is the scale design: a global NTILE serializes the corpus through
    // one partition to assign ranks, while per-segment windows rank in
    // parallel (p04's principle); exact global deciles at 100 TB would
    // instead use approx percentile boundaries + a broadcast bucket map.
    // Deterministic tie-break (balance, custkey) so both engines bucket
    // identically.
    GQuery("q34_decile_stats",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".desc, $"c_custkey".asc)
        t(s, d, "customer")
          .withColumn("decile", ntile(10).over(w).cast(LongType))
          .groupBy($"c_mktsegment", $"decile")
          .agg(count(lit(1)).as("n_customers"),
            min($"c_acctbal").as("min_bal"),
            max($"c_acctbal").as("max_bal"),
            sumd(d2($"c_acctbal")).as("total_bal"))
          .orderBy($"c_mktsegment", $"decile")
      },
      Some("""
        WITH ranked AS (
          SELECT c_mktsegment, c_acctbal,
                 CAST(NTILE(10) OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS decile
          FROM customer)
        SELECT c_mktsegment, decile, COUNT(*) AS n_customers,
               MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
        FROM ranked GROUP BY c_mktsegment, decile
        ORDER BY c_mktsegment, decile""")),

    // ── q35: argmax/argmin aggregates — the priciest and cheapest part ──
    // per brand via max_by/min_by, ONE aggregation pass: no self-join, no
    // ranking window, no second shuffle. max_by's tie behavior is
    // engine-defined, so the ordering key packs (price-in-cents, -partkey)
    // into one exact BIGINT — price ties break on partkey, identically
    // in both engines. (round() only snaps the 2-dp price's float noise
    // to its integer cent value; it never decides a tie.)
    GQuery("q35_argmax_group",
      (s, d) => {
        import s.implicits._
        val key = (roundz($"p_retailprice" * 100).cast(LongType) * 1000000000L
          - $"p_partkey").as("ord_key")
        t(s, d, "part")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"),
            max_by($"p_name", key).as("top_part"),
            max($"p_retailprice").as("top_price"),
            min_by($"p_name", key).as("bottom_part"),
            min($"p_retailprice").as("bottom_price"))
          .orderBy($"p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_parts,
               arg_max(p_name, CAST((ROUND(p_retailprice * 100) + 0.0) AS BIGINT) * 1000000000 - p_partkey) AS top_part,
               MAX(p_retailprice) AS top_price,
               arg_min(p_name, CAST((ROUND(p_retailprice * 100) + 0.0) AS BIGINT) * 1000000000 - p_partkey) AS bottom_part,
               MIN(p_retailprice) AS bottom_price
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // ── q36: ordered list aggregation — each customer's chronological ──
    // order-status journey as one string ("behavior sequence" feature).
    // collect_list is order-nondeterministic under parallel merge, so the
    // canonical Spark form sorts AFTER collecting (sort_array over
    // (date, key, status) structs), which is also the scale story: the
    // sort is per-group over ≤ the customer's own orders, never global.
    GQuery("q36_order_journey",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            array_join(
              transform(
                sort_array(collect_list(struct($"o_orderdate", $"o_orderkey", $"o_orderstatus"))),
                x => x.getField("o_orderstatus")),
              ",").as("journey"))
          .orderBy($"o_custkey")
      },
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               string_agg(o_orderstatus, ',' ORDER BY o_orderdate, o_orderkey) AS journey
        FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // ── q37: rank-based feature scaling — percent_rank and cume_dist ──
    // per market segment: the monotone [0,1] normalization feature
    // pipelines use when raw balances are heavy-tailed. Same per-segment
    // window discipline as q34 (a global rank would serialize); the
    // (balance, custkey) tiebreak makes every rank — and therefore both
    // quotients — engine-identical, so 6-dp rounding can't wobble.
    GQuery("q37_rank_scaling",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".asc, $"c_custkey".asc)
        t(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
            roundz(percent_rank().over(w), 6).as("pct_rank"),
            roundz(cume_dist().over(w), 6).as("cume"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               (ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC, c_custkey ASC), 6) + 0.0) AS pct_rank,
               (ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC, c_custkey ASC), 6) + 0.0) AS cume
        FROM customer ORDER BY c_custkey""")),

    // ── q38: Pareto (ABC) revenue coverage — which parts make the first ──
    // 80% of each brand's revenue. The fact stream aggregates to
    // per-part revenue FIRST (map-side partial agg collapses lineitem
    // before anything joins), then the small per-part frame joins the
    // part dim and runs two windows per brand (cumulative + total) in
    // one shuffle. Revenue stays DECIMAL through ordering and cumsum —
    // exact, so the running share is deterministic — and surfaces as
    // DOUBLE only in the final single division.
    GQuery("q38_pareto_coverage",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val rev = t(s, d, "lineitem")
          .groupBy($"l_partkey")
          .agg(sum(d2($"l_extendedprice")).as("rev"))
        val wCum = Window.partitionBy($"p_brand").orderBy($"rev".desc, $"p_partkey".asc)
        val wTot = Window.partitionBy($"p_brand")
        rev.join(t(s, d, "part").select($"p_partkey", $"p_brand"),
            $"l_partkey" === $"p_partkey")
          .withColumn("cum", sum($"rev").over(wCum))
          .withColumn("total", sum($"rev").over(wTot))
          .select($"p_brand", $"p_partkey",
            $"rev".cast(DoubleType).as("revenue"),
            roundz($"cum".cast(DoubleType) / $"total".cast(DoubleType), 6).as("cum_share"))
          .withColumn("in_core", $"cum_share" <= 0.8)
          .orderBy($"p_brand", $"cum_share", $"p_partkey")
      },
      Some("""
        WITH rev AS (
          SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS rev
          FROM lineitem GROUP BY l_partkey),
        shares AS (
          SELECT p_brand, p_partkey, rev,
                 SUM(rev) OVER (PARTITION BY p_brand
                   ORDER BY rev DESC, p_partkey ASC) AS cum,
                 SUM(rev) OVER (PARTITION BY p_brand) AS total
          FROM rev JOIN part ON l_partkey = p_partkey)
        SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue,
               (ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) + 0.0) AS cum_share,
               (ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) + 0.0) <= 0.8 AS in_core
        FROM shares ORDER BY p_brand, cum_share, p_partkey""")),

    // ── q39: explicit GROUPING SETS — the shape ROLLUP/CUBE can't ──
    // express: ((status, priority), (status), (priority), ()) includes
    // the (priority)-only marginal, which no rollup order produces.
    // Spark 4's native Dataset.groupingSets API → one Expand (×4) before
    // partial aggregation, so the shuffle carries group rows, never the
    // fact stream 4×. The grouping id is computed as grouping(a)·2 +
    // grouping(b) on BOTH engines — single-column GROUPING() agrees
    // everywhere, whereas multi-arg grouping_id bit order is an
    // engine-specific convention.
    GQuery("q39_grouping_sets",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupingSets(
            Seq(Seq($"o_orderstatus", $"o_orderpriority"),
              Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
            $"o_orderstatus", $"o_orderpriority")
          .agg((grouping($"o_orderstatus") * 2 + grouping($"o_orderpriority")).as("gid"),
            count(lit(1)).as("n_orders"),
            sumd(d2($"o_totalprice")).as("total_spend"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"gid", $"n_orders", $"total_spend")
          .orderBy($"gid", $"status", $"priority")
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, status, priority""")),

    // ── q40: equi-width histogram of order totals — the profiling scan ──
    // behind every "does this column look sane" check. Bucketing is
    // EXACT INTEGER arithmetic: cents = totalprice as DECIMAL(14,2)×100
    // → BIGINT, bucket = cents DIV 5 000 000 (a float divide would land
    // x.9999… vs y.0 on engine-boundary values). One partial-agg'd
    // groupBy on a ≤13-value key; the share divides by a window total
    // over the 13-row aggregate, never re-scanning the fact.
    GQuery("q40_price_histogram",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        t(s, d, "orders")
          .select((d2($"o_totalprice") * 100).cast(LongType).as("cents"))
          .select(least(lit(12L), expr("cents DIV 5000000")).as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_orders"))
          .withColumn("lo", $"bucket" * 50000L)
          .withColumn("share",
            roundz($"n_orders".cast(DoubleType) /
              sum($"n_orders").over(Window.partitionBy()), 6))
          .select($"bucket", $"lo", $"n_orders", $"share")
          .orderBy($"bucket")
      },
      Some("""
        WITH b AS (
          SELECT LEAST(12, CAST(CAST(o_totalprice AS DECIMAL(14,2))*100 AS BIGINT) // 5000000) AS bucket
          FROM orders),
        h AS (SELECT bucket, COUNT(*) AS n_orders FROM b GROUP BY bucket)
        SELECT bucket, bucket*50000 AS lo, n_orders,
               (ROUND(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 6) + 0.0) AS share
        FROM h ORDER BY bucket""")),

    // ── q41: leave-one-out target encoding — each supplier's balance vs ──
    // the mean of the OTHER suppliers in its nation: the LOO
    // normalization feature pipelines use to avoid self-leakage in
    // per-group encodings. One window over the nation partition computes
    // sum and count; loo = (Σ − x)/(n−1) — the subtraction stays
    // DECIMAL-exact, so the only float op is the final division. n = 1
    // groups surface NULL (no peers), identically on both engines.
    GQuery("q41_target_encode",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"s_nationkey")
        t(s, d, "supplier")
          .select($"s_suppkey", $"s_nationkey", $"s_acctbal",
            sum(d2($"s_acctbal")).over(w).as("tot"),
            count(lit(1)).over(w).as("n"))
          .withColumn("loo_mean",
            when($"n" > 1,
              roundz(($"tot" - d2($"s_acctbal")).cast(DoubleType) / ($"n" - 1), 6)))
          .select($"s_suppkey", $"s_nationkey", $"s_acctbal", $"n".as("n_peers_incl"), $"loo_mean")
          .orderBy($"s_suppkey")
      },
      Some("""
        WITH w AS (
          SELECT s_suppkey, s_nationkey, s_acctbal,
                 SUM(CAST(s_acctbal AS DECIMAL(14,2))) OVER (PARTITION BY s_nationkey) AS tot,
                 COUNT(*) OVER (PARTITION BY s_nationkey) AS n
          FROM supplier)
        SELECT s_suppkey, s_nationkey, s_acctbal, n AS n_peers_incl,
               CASE WHEN n > 1
                 THEN (ROUND(CAST(tot - CAST(s_acctbal AS DECIMAL(14,2)) AS DOUBLE) / (n - 1), 6) + 0.0)
               END AS loo_mean
        FROM w ORDER BY s_suppkey""")),

    // ── q42: fulfillment-latency distribution — ship-date minus order- ──
    // date percentiles per order priority: the operational-SLA rollup.
    // The lineitem⋈orders join is the co-partitioned orderkey fact join
    // (q04's shape — both sides hash on the key once; bucketed layout
    // makes it exchange-free, EngineSpec's bucketed-join pin). Latency
    // is DATE−DATE integer days — exact on both engines — and the
    // interpolated percentiles of integers are halves/quarters, which
    // binary doubles represent exactly: no rounding wobble.
    GQuery("q42_ship_latency",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem").select($"l_orderkey", $"l_shipdate")
          .join(t(s, d, "orders").select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_orderpriority", datediff($"l_shipdate", $"o_orderdate").as("lat"))
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_lineitems"),
            roundz(expr("percentile(lat, 0.5)"), 4).as("p50_days"),
            roundz(expr("percentile(lat, 0.9)"), 4).as("p90_days"),
            max($"lat").as("max_days"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        WITH lat AS (
          SELECT o_orderpriority,
                 CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS lat
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT o_orderpriority, COUNT(*) AS n_lineitems,
               (ROUND(quantile_cont(lat, 0.5), 4) + 0.0) AS p50_days,
               (ROUND(quantile_cont(lat, 0.9), 4) + 0.0) AS p90_days,
               CAST(MAX(lat) AS INT) AS max_days
        FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q43: national market share (TPC-H Q8 shape) — per year, each ──
    // supplier nation's share of PROMO-part revenue sold to AMERICA
    // customers: the canonical 7-table join Catalyst must ORDER well.
    // Shape: selective dims (filtered part, supplier→nation, and the
    // region-filtered customer→nation chain) broadcast against the two
    // co-partitioned facts — lineitem⋈orders is the ONLY big shuffle;
    // at 100 TB AQE decides whether the filtered customer side still
    // broadcasts or sort-merges on custkey. Revenue price×(1−disc)
    // stays DECIMAL through the share division's operands (exact),
    // surfacing as DOUBLE in the one final divide.
    GQuery("q43_market_share",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val amerCust = t(s, d, "customer").select($"c_custkey", $"c_nationkey")
          .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_regionkey")),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, d, "region").filter($"r_name" === "AMERICA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"c_custkey")
        val suppNation = t(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
          .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        val promo = t(s, d, "part").filter($"p_type" === "PROMO").select($"p_partkey")
        val rev = t(s, d, "lineitem")
          .join(broadcast(promo), $"l_partkey" === $"p_partkey")
          .join(t(s, d, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate"),
            $"l_orderkey" === $"o_orderkey")
          .join(amerCust, $"o_custkey" === $"c_custkey")
          .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
          .select(year($"o_orderdate").as("yr"), $"supp_nation",
            (d2($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - r2($"l_discount"))).as("rev"))
          .groupBy($"yr", $"supp_nation")
          .agg(sum($"rev").as("nation_rev"))
        rev
          .withColumn("total", sum($"nation_rev").over(Window.partitionBy($"yr")))
          .select($"yr", $"supp_nation",
            $"nation_rev".cast(DoubleType).as("revenue"),
            roundz($"nation_rev".cast(DoubleType) / $"total".cast(DoubleType), 6).as("share"))
          .orderBy($"yr", $"supp_nation")
      },
      Some("""
        WITH rev AS (
          SELECT CAST(year(o_orderdate) AS INT) AS yr, n2.n_name AS supp_nation,
                 SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS nation_rev
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          GROUP BY yr, supp_nation)
        SELECT yr, supp_nation, CAST(nation_rev AS DOUBLE) AS revenue,
               (ROUND(CAST(nation_rev AS DOUBLE)
                 / CAST(SUM(nation_rev) OVER (PARTITION BY yr) AS DOUBLE), 6) + 0.0) AS share
        FROM rev ORDER BY yr, supp_nation""")),

    // ── q44: discrete percentiles — PERCENTILE_DISC / WITHIN GROUP: ──
    // unlike q21's interpolated form, disc returns ACTUAL data values,
    // so the result is engine-exact with no fp interpolation at all —
    // the right quantile flavor for "show me a real p90 order". Same
    // two-phase group-sort aggregation; values pass through untouched.
    GQuery("q44_percentile_disc",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_orderstatus")
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50_disc"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90_disc"),
            min($"o_totalprice").as("lo"),
            max($"o_totalprice").as("hi"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               quantile_disc(o_totalprice, 0.5) AS p50_disc,
               quantile_disc(o_totalprice, 0.9) AS p90_disc,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ── q45: exact-moment Pearson correlation + regression slope — ──
    // built-in corr() accumulates double co-moments in partition order
    // (nondeterministic at the ulp level); here every moment Σx Σy Σxy
    // Σx² Σy² is an EXACT DECIMAL sum, surfaced through the q30
    // string-cast (decimal→text→double is bit-identical cross-engine),
    // and the final formula is a fixed-order double expression — the
    // same bits on every engine and every partitioning. One partial-agg
    // pass over the fact; no second scan, no window.
    GQuery("q45_exact_corr",
      (s, d) => {
        import s.implicits._
        val x = d2($"l_quantity"); val y = d2($"l_extendedprice")
        t(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * y).as("sxy"), sum(x * x).as("sx2"), sum(y * y).as("sy2"))
          .select(Seq($"l_returnflag", $"n") ++ {
            val sx = $"sx".cast(StringType).cast(DoubleType)
            val sy = $"sy".cast(StringType).cast(DoubleType)
            val sxy = $"sxy".cast(StringType).cast(DoubleType)
            val sx2 = $"sx2".cast(StringType).cast(DoubleType)
            val sy2 = $"sy2".cast(StringType).cast(DoubleType)
            val cxy = sxy - sx * sy / $"n"
            val vx = sx2 - sx * sx / $"n"
            val vy = sy2 - sy * sy / $"n"
            Seq((cxy / ($"n" - 1)).as("cov_samp"),
              (cxy / sqrt(vx * vy)).as("corr"),
              (cxy / vx).as("slope"))
          }: _*)
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, n,
               (sxy - sx * sy / n) / (n - 1) AS cov_samp,
               (sxy - sx * sy / n) / sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)) AS corr,
               (sxy - sx * sy / n) / (sx2 - sx * sx / n) AS slope
        FROM (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sy,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxy,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx2,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sy2
          FROM lineitem GROUP BY l_returnflag)
        ORDER BY l_returnflag""")),

    // ── q47: boolean / bitwise aggregates — bool_and / bool_or / bit_or ──
    // in one partial-agg pass: the flag-rollup shape behind "does any
    // part in this brand need review" dashboards. All three are exact
    // integer/boolean lattice folds — associative, commutative, order-
    // free — so no determinism scaffolding is needed at any scale.
    GQuery("q46_bool_agg",
      (s, d) => {
        import s.implicits._
        t(s, d, "part")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"),
            bool_or($"p_type" === "PROMO").as("any_promo"),
            bool_and($"p_size" > 1).as("all_sized"),
            bit_or($"p_size".cast(LongType)).as("size_mask"))
          .orderBy($"p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_parts,
               bool_or(p_type = 'PROMO') AS any_promo,
               bool_and(p_size > 1) AS all_sized,
               CAST(bit_or(CAST(p_size AS BIGINT)) AS BIGINT) AS size_mask
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // ── q47: null-safe join semantics — `<=>` (IS NOT DISTINCT FROM) ──
    // next to plain `=` on a key with NULLs (synthesized via NULLIF):
    // the ETL backbone for change-capture merges where NULL must match
    // NULL (a plain equality join silently drops every NULL-keyed row —
    // the classic silent-data-loss bug this operator makes visible:
    // nb_plain is NULL exactly for the NULL key group). Both joins are
    // equality-shaped (null-safe equality still hash-partitions), so
    // the plan is a hash join either way.
    GQuery("q47_nullsafe_join",
      (s, d) => {
        import s.implicits._
        val keyed = t(s, d, "part")
          .select(nullif($"p_brand", lit("Brand#45")).as("k"))
          .groupBy($"k").agg(count(lit(1)).as("n"))
        val a = keyed.select($"k".as("ka"), $"n".as("na"))
        val b = keyed.select($"k".as("kb"), $"n".as("nb"))
        val ns = a.join(b, $"ka" <=> $"kb")
          .select($"ka", $"na", $"nb".as("nb_nullsafe"))
        val pl = a.join(b, $"ka" === $"kb", "left_outer")
          .select($"ka".as("ka2"), $"nb".as("nb_plain"))
        ns.join(pl, $"ka" <=> $"ka2")
          .select(coalesce($"ka", lit("(null)")).as("key"),
            $"na", $"nb_nullsafe", $"nb_plain")
          .orderBy($"key")
      },
      Some("""
        WITH keyed AS (
          SELECT NULLIF(p_brand, 'Brand#45') AS k, COUNT(*) AS n
          FROM part GROUP BY k),
        ns AS (
          SELECT a.k AS ka, a.n AS na, b.n AS nb_nullsafe
          FROM keyed a JOIN keyed b ON a.k IS NOT DISTINCT FROM b.k),
        pl AS (
          SELECT a.k AS ka2, b.n AS nb_plain
          FROM keyed a LEFT JOIN keyed b ON a.k = b.k)
        SELECT COALESCE(ka, '(null)') AS key, na, nb_nullsafe, nb_plain
        FROM ns JOIN pl ON ka IS NOT DISTINCT FROM ka2
        ORDER BY key""")),

    // ── q48: per-group MODE (most frequent value) — the categorical ──
    // profiling aggregate SQL engines ship as MODE()/mode WITHIN GROUP.
    // Built-in mode() is tie-nondeterministic across engines, so this is
    // the portable two-stage form: count per (group, value) — map-side
    // partial agg — then one ranking window over the COUNTED frame
    // (|groups|×|values| rows, tiny at any scale), ties broken (n DESC,
    // value ASC) so both engines elect the same winner. The corpus is
    // touched once; the window never sees raw rows.
    GQuery("q48_group_mode",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_orderstatus").orderBy($"n".desc, $"o_orderpriority".asc)
        t(s, d, "orders")
          .groupBy($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_orderstatus", $"o_orderpriority".as("mode_priority"), $"n".as("mode_n"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        WITH counts AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders GROUP BY o_orderstatus, o_orderpriority),
        ranked AS (
          SELECT o_orderstatus, o_orderpriority, n,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                   ORDER BY n DESC, o_orderpriority ASC) AS rn
          FROM counts)
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
        FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""")),

    // ── q49: top-k per group as a PARTIAL AGGREGATE — the custom ──
    // TypedImperativeAggregate (functions/TopKAgg.scala) instead of q09's
    // Window: each map task folds rows into a k-slot heap, the shuffle
    // carries ≤ k pairs per (task, group), merge folds heaps — no global
    // per-group sort ever happens. At 100 TB the Window form shuffles and
    // sorts EVERY row of a hot group through one partition; this form's
    // shuffle is bounded by k·tasks·groups however the data grows.
    // Eviction uses a total order (price DESC, orderkey ASC), so the
    // result is row- and merge-order independent — the oracle's
    // ROW_NUMBER mirror is exact. o_totalprice is DECIMAL(15,2) with
    // values ≪ 2^53/100: the cast to DOUBLE is lossless on both engines.
    GQuery("q49_topk_agg",
      (s, d) => {
        import s.implicits._
        import graft.functions.TopKAgg.topK
        t(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(topK($"o_totalprice".cast(DoubleType),
            $"o_orderkey".cast(LongType), 5).as("tk"))
          .select($"o_orderpriority", posexplode($"tk"))
          .select($"o_orderpriority", ($"pos" + 1).cast(LongType).as("rk"),
            $"col.id".as("o_orderkey"), $"col.score".as("total_price"))
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""
        WITH ranked AS (
          SELECT o_orderpriority, o_orderkey,
                 CAST(o_totalprice AS DOUBLE) AS total_price,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey ASC) AS rk
          FROM orders)
        SELECT o_orderpriority, rk, o_orderkey, total_price
        FROM ranked WHERE rk <= 5 ORDER BY o_orderpriority, rk""")),

    // ── q50: RECURSIVE CTE — per-customer compounding balance chain ──
    // (each order: balance = round(prev×1.01, 2) + amount). The per-step
    // ROUNDING makes the fold non-associative, so no window frame or
    // aggregate can express it — this is the shape that genuinely needs
    // SQL recursion (Spark 4's WITH RECURSIVE; DuckDB runs the identical
    // statement as the oracle). Scale: the recursion is SET-BASED — each
    // iteration advances EVERY customer's chain one step via one
    // co-partitioned equi-join of the ≤|customers|-row frontier with the
    // ranked orders, so depth = the LONGEST chain (orders per customer,
    // a bounded TPC-H property ~41 at any SF), never the row count.
    // All arithmetic DECIMAL-exact; final balance < 2^53/100 so the
    // DOUBLE surfacing is lossless on both engines.
    GQuery("q50_recursive_cte",
      (s, d) => {
        // UnionLoop re-executes the step plan every iteration, and a CTE
        // reference inlines its definition — so `ranked` (a corpus-wide
        // window) would be recomputed ~41× (the longest chain). CACHE the
        // ranked frame once and let every iteration's equi-join hit the
        // InMemoryRelation: measured 10.5 s → ~6 s at sf0.1. DuckDB's
        // oracle keeps the one-statement form (its executor materializes
        // CTEs); the SQL text is shared modulo this materialization seam.
        // The cache is orders-scale, so it follows Dedup's memo contract:
        // memoized per (session, corpus), released via releaseCaches()
        // (called wherever releaseSignatures is) — never left pinned by
        // a one-off caller.
        t(s, d, "orders").createOrReplaceTempView("g_orders")
        rankedCache.getOrElseUpdate((s, d),
            s.sql(s"SELECT * FROM (${RankedOrdersSql("g_orders")})").cache())
          .createOrReplaceTempView("g_ranked")
        // Spark's recursion guard caps TOTAL rows ever produced by the
        // CTE (default 10^6) — a runaway-recursion backstop, but this
        // recursion's total is exactly |orders| (every order enters the
        // chain once), so the default trips at sf≥1 (1.5M orders; found
        // by the SCALING.md sf1 correctness sweep). Size the guard to
        // the corpus with the same 2× margin a production job would,
        // keeping it a real backstop instead of disabling it.
        val totalRows = s.table("g_ranked").count()
        s.conf.set("spark.sql.cteRecursionRowLimit",
          math.max(1000000L, totalRows * 2).toString)
        s.sql(RecursiveChainSql("g_ranked"))
      },
      Some(RecursiveBalanceSql("orders"))),

    // ── q51: EXACT quantiles WITHOUT a global sort — distributed ──
    // selection by histogram rank-narrowing. percentile_disc (q44) is
    // exact but sort-based: Spark's aggregate buffers every group value,
    // and a corpus-wide percentile would sort 100 TB to read 4 ranks.
    // Here the target rank ceil(p·n) is located by TWO bucket-count
    // rounds (B=1024 each: scan → ≤B-row partial-agg histogram → the
    // rank's bucket), narrowing the candidate range to n/B² rows
    // (~10⁶ at 10¹² rows), and only THAT slice pays a per-target sort —
    // the classic external-selection trade: 4 single-column scans, zero
    // corpus shuffles (histograms collapse map-side), no row ever leaves
    // its partition until the final n/B²-row pick. Rounds generalize as
    // ⌈log_B(n/budget)⌉; ties/degenerate ranges fall out of the rank
    // bookkeeping (bucket functions are recomputed bit-identically at
    // every round, so boundary placement never affects exactness — the
    // answer is a RAW corpus value selected by count, not arithmetic).
    // Oracle: the rank convention is spelled out, not borrowed —
    // row_number at ceil(p·n) with DECIMAL-exact p·n on both engines.
    // (algorithm in [[exactQuantiles]] below, reused by PropertySpec's
    // narrowing-vs-sort law with a small B to force deep multi-bucket paths)
    GQuery("q51_exact_quantile",
      (s, d) => {
        import s.implicits._
        exactQuantiles(
          t(s, d, "lineitem").select($"l_extendedprice".as("v")),
          Seq("0.25", "0.50", "0.75", "0.95"))
      },
      Some("""
        WITH t AS (SELECT l_extendedprice AS v FROM lineitem),
        n AS (SELECT COUNT(*) AS n FROM t),
        ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rk FROM t),
        ps AS (SELECT CAST(p AS DECIMAL(3,2)) AS pd
               FROM (VALUES (0.25),(0.50),(0.75),(0.95)) AS x(p))
        SELECT CAST(pd AS DOUBLE) AS p, r.v AS value
        FROM ps, n, ranked r
        WHERE r.rk = CAST(CEIL(pd * n.n) AS BIGINT)
        ORDER BY p""")),

    // ── q52: the SAME non-associative compounding fold as q50, as a ──
    // SINGLE-PASS higher-order aggregate — the at-scale winner when the
    // per-group sequence is row-bounded (orders/customer ≈ 41 at any
    // TPC-H SF): one groupBy collects each customer's (date, key, amt)
    // structs, sort_array orders them exactly like q50's ROW_NUMBER, and
    // `aggregate` folds left-to-right with the per-step ROUND — O(1)
    // jobs and one shuffle where UnionLoop pays ~depth job rounds.
    // (bal₁ = amt₁ falls out of init 0: round(0·1.01 + amt₁) = amt₁.)
    // q50 stays the recursion-coverage form — the shape you need when
    // chains are unbounded or graph-shaped; this is the shape you ship
    // when they are bounded. Oracle: the IDENTICAL DuckDB recursion as
    // q50 — two radically different plans, one cross-engine-pinned
    // answer, DECIMAL-exact at every step.
    GQuery("q52_group_fold",
      (s, d) => {
        import s.implicits._
        val step = (acc: Column, x: Column) =>
          round(acc * lit(BigDecimal("1.01")).cast(DecimalType(5, 2))
            + x.getField("amt"), 2).cast(DecimalType(18, 2))
        t(s, d, "orders")
          .select($"o_custkey".as("cust"), $"o_orderdate", $"o_orderkey",
            d2($"o_totalprice").as("amt"))
          .groupBy($"cust")
          .agg(sort_array(collect_list(
            struct($"o_orderdate", $"o_orderkey", $"amt"))).as("xs"))
          .select($"cust",
            size($"xs").cast(LongType).as("n_orders"),
            aggregate($"xs",
              lit(BigDecimal("0.00")).cast(DecimalType(18, 2)), step)
              .cast(DoubleType).as("final_bal"))
          .orderBy($"cust")
      },
      Some(RecursiveBalanceSql("orders"))),

    // ── q53: GROUPED exact quantiles by rank-narrowing — q51's ──
    // algorithm with a group key (exactQuantilesBy). The at-scale gap
    // it closes vs q44: percentile_disc is exact but its aggregate
    // BUFFERS every group value (a 10⁹-row group OOMs one task); here
    // each narrowing round is a plain (group, bucket) count aggregate —
    // partial map-side, ≤|groups|·1024 rows shuffled — and only each
    // group's final n_g/B² slice sorts. Oracle: the same spelled-out
    // rank convention as q51, per group.
    GQuery("q53_grouped_quantile",
      (s, d) => {
        import s.implicits._
        exactQuantilesBy(
          t(s, d, "orders").select($"o_orderstatus", $"o_totalprice".as("v")),
          Seq("o_orderstatus"), Seq("0.50", "0.95"))
      },
      Some("""
        WITH t AS (SELECT o_orderstatus AS g, o_totalprice AS v FROM orders),
        n AS (SELECT g, COUNT(*) AS n FROM t GROUP BY g),
        ranked AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rk FROM t),
        ps AS (SELECT CAST(p AS DECIMAL(3,2)) AS pd
               FROM (VALUES (0.50),(0.95)) AS x(p))
        SELECT r.g AS o_orderstatus, CAST(pd AS DOUBLE) AS p, r.v AS value
        FROM ps, n, ranked r
        WHERE r.g = n.g AND r.rk = CAST(CEIL(pd * n.n) AS BIGINT)
        ORDER BY o_orderstatus, p""")),

    // ── q54: grouped exact quantiles by SKETCH-then-refine — q53's ──
    // answer from a different machine: ONE pass folds each group into a
    // mergeable Munro–Paterson summary (quantile_sketch, O(k·log(n/k))
    // state, shuffle carries the summary, never values), the summary's
    // SELF-TRACKED rank-error bound brackets the target rank with
    // (loV, hiV], and an exact pass counts below loV and sorts only the
    // bracketed slice (≤ ~2·err rows per group). The sketch contents
    // are merge-order-dependent; the BOUND holds for every order, so
    // the refined answer is deterministic and oracle-exact — the same
    // discipline as t29 (MG candidates → exact recount). vs q53: one
    // narrowing pass instead of two, and the summary is reusable/
    // streamable (windowed percentiles share the aggregate). Oracle:
    // identical per-group rank convention — q53 and q54 are two plans
    // pinned to one answer.
    GQuery("q54_sketch_quantile",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        import graft.functions.QuantileSketchAgg.quantileSketch
        val base = t(s, d, "orders").select($"o_orderstatus", $"o_totalprice".as("v"))
        val sk = base.groupBy($"o_orderstatus")
          .agg(quantileSketch($"v", 1024).as("sk"))
          .select($"o_orderstatus", $"sk.items".as("items"),
            $"sk.n".as("n"), $"sk.err".as("err"))
        val targets = Seq("0.50", "0.95").toDF("ps")
          .select($"ps".cast(DecimalType(3, 2)).as("pd"))
          .crossJoin(broadcast(sk))
          .select($"o_orderstatus", $"pd", $"err", $"items",
            ceil($"pd" * $"n").cast(LongType).as("rk"))
        // bracket: cumulative weight over the ≤ k·log(n/k) summary items;
        // RANGE frame (orderBy value) so ties carry their full tie-group
        // weight — cum(x) IS the summary's rank estimate R̂(x)
        val ex = targets
          .select($"o_orderstatus", $"pd", $"rk", $"err", explode($"items").as("it"))
          .select($"o_orderstatus", $"pd", $"rk", $"err",
            $"it.v".as("iv"), $"it.w".as("iw"))
        val cum = ex.withColumn("cum", sum($"iw").over(
          Window.partitionBy($"o_orderstatus", $"pd").orderBy($"iv")))
        // R(loV) ≤ R̂(loV)+err ≤ rk−1 < rk keeps loV strictly below the
        // answer; R(hiV) ≥ R̂(hiV)−err ≥ rk keeps hiV at-or-above it
        val bounds = cum.groupBy($"o_orderstatus", $"pd", $"rk")
          .agg(max(when($"cum" <= $"rk" - $"err" - 1, $"iv")).as("loV"),
            min(when($"cum" >= $"rk" + $"err", $"iv")).as("hiV"))
          .select($"o_orderstatus", $"pd", $"rk",
            coalesce($"loV", lit(Double.MinValue)).as("lo"),
            coalesce($"hiV", lit(Double.MaxValue)).as("hi"))
        // exact refine: count below the bracket, sort only inside it
        val joined = base.join(broadcast(bounds), Seq("o_orderstatus"))
        val below = joined.filter($"v" <= $"lo")
          .groupBy($"o_orderstatus", $"pd").agg(count(lit(1)).as("below"))
        val wv = Window.partitionBy($"o_orderstatus", $"pd").orderBy($"v")
        joined.filter($"v" > $"lo" && $"v" <= $"hi")
          .join(broadcast(below), Seq("o_orderstatus", "pd"), "left")
          .withColumn("rn", row_number().over(wv))
          .filter($"rn" === $"rk" - coalesce($"below", lit(0L)))
          .select($"o_orderstatus", $"pd".cast(DoubleType).as("p"), $"v".as("value"))
          .orderBy($"o_orderstatus", $"p")
      },
      Some("""
        WITH t AS (SELECT o_orderstatus AS g, o_totalprice AS v FROM orders),
        n AS (SELECT g, COUNT(*) AS n FROM t GROUP BY g),
        ranked AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rk FROM t),
        ps AS (SELECT CAST(p AS DECIMAL(3,2)) AS pd
               FROM (VALUES (0.50),(0.95)) AS x(p))
        SELECT r.g AS o_orderstatus, CAST(pd AS DOUBLE) AS p, r.v AS value
        FROM ps, n, ranked r
        WHERE r.g = n.g AND r.rk = CAST(CEIL(pd * n.n) AS BIGINT)
        ORDER BY o_orderstatus, p""")),

    // ── q55: LATERAL correlated subquery — "each customer's 3 most ──
    // recent orders" in the SQL-standard LATERAL form, the SAME text on
    // both engines. Spark de-correlates the ordered-limit subquery
    // (window per domain) rather than re-executing it per outer row, so
    // the convenient surface costs nothing at scale — the optimized
    // plan is q09's partition-window family, one shuffle on the
    // correlation key. Ties can't occur: o_orderkey breaks them.
    GQuery("q55_lateral_topk",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("g_customer")
        t(s, d, "orders").createOrReplaceTempView("g_orders_l")
        s.sql(LateralTopkSql("g_customer", "g_orders_l"))
      },
      Some(LateralTopkSql("customer", "orders")))
  )

  /** q50's memoized corpus-scale ranked frame (see the query comment). */
  private val rankedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Per-call cached coordination frames ([[exactQuantilesBy]]'s
    * stats/t1/t2) registered for release: each is kilobytes, but without
    * a release hook a long-lived session calling the library repeatedly
    * accumulates pinned InMemoryRelations until LRU eviction.
    */
  private val trackedCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def tracked(df: DataFrame): DataFrame = { trackedCaches.add(df); df }

  /** Release every cache this module holds (q50's corpus-scale ranked
    * frame + the quantile coordination frames) — the
    * [[graft.operators.Dedup.releaseSignatures]] contract; Verify and
    * Bench call both together.
    */
  def releaseCaches(): Unit = {
    rankedCache.values.foreach { df =>
      try df.unpersist() catch { case scala.util.control.NonFatal(_) => () }
    }
    rankedCache.clear()
    var df = trackedCaches.poll()
    while (df != null) {
      try df.unpersist() catch { case scala.util.control.NonFatal(_) => () }
      df = trackedCaches.poll()
    }
  }

  /** One LATERAL text, two engines (q55). The date stays INSIDE the
    * lateral (it only ranks recency): raw timestamp outputs carry a TZ
    * dtype on the Spark parquet side that DuckDB's naive timestamps
    * don't, so cross-engine outputs stick to keys and decimals
    * (SURVEY §6 discipline).
    */
  private def LateralTopkSql(cust: String, ord: String): String = s"""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM $cust c,
    LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice
             FROM $ord o WHERE o.o_custkey = c.c_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 3) o
    ORDER BY c.c_custkey, o.o_orderkey"""

  /** EXACT quantiles by two-round histogram rank-narrowing (q51's
    * algorithm): for each decimal-string probability in `ps`, the value
    * at rank ceil(p·n) of `base`'s single column `v` — the answer
    * percentile_disc gives, WITHOUT a global sort. Two B-bucket count
    * rounds narrow each target rank to an n/B² candidate slice; only
    * that slice sorts. `bucketsB` is a knob so tests can force deep
    * multi-bucket narrowing on small corpora (the query uses 1024).
    *
    * The tiny coordination frames (1-row stats, ≤|ps|-row targets) are
    * CACHED — kilobytes — so each round reuses them instead of
    * re-deriving the whole prefix: the corpus is scanned exactly once
    * per round (4 single-column scans total), which is the algorithm's
    * entire IO bill. The cached frames are registered with
    * [[releaseCaches]] (the same contract as q50's ranked frame): each
    * entry is tiny, but a long-lived session calling this repeatedly
    * would otherwise accumulate pinned InMemoryRelations until LRU
    * eviction — the release hook keeps library callers leak-free.
    */
  def exactQuantiles(base0: DataFrame, ps: Seq[String],
                     bucketsB: Int = 1024): DataFrame =
    exactQuantilesBy(base0, Seq.empty, ps, bucketsB)
      .drop("__g")

  /** GROUPED form of [[exactQuantiles]] (q53): exact per-group quantiles
    * with NO per-group value buffering — where q44's percentile_disc
    * aggregate holds every group value in its buffer (OOM at a 10⁹-row
    * group), the narrowing rounds here are plain (keys, bucket) count
    * aggregates: partial-agg map-side, ≤|groups|·B rows shuffled, and
    * the only sorted sets are each group's final n_g/B² slice. All
    * coordination frames stay |groups|-sized (broadcast); every join is
    * a using-join on the group keys, so SQL name resolution — not
    * positional luck — lines the sides up.
    */
  def exactQuantilesBy(base0: DataFrame, keys: Seq[String], ps: Seq[String],
                       bucketsB: Int = 1024): DataFrame = {
    val s = base0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = bucketsB
    // keyless callers get a constant group so ONE code path serves both
    val (kNames, base) =
      if (keys.nonEmpty) (keys, base0.select((keys.map(col) :+ $"v"): _*))
      else (Seq("__g"), base0.select(lit(0).as("__g"), $"v"))
    val kc = kNames.map(col)
    val stats = tracked(base.groupBy(kc: _*).agg(count(lit(1)).as("n"),
      min($"v").as("lo"), max($"v").as("hi")).cache())
    // clamp into [0, B-1]: float drift at bucket edges may land a hair
    // outside; clamping keeps the bucket function TOTAL, and exactness
    // never depends on boundary placement — only on the same function
    // being reused verbatim in later rounds
    def bucket(vc: Column, loC: Column, wC: Column): Column =
      when(wC <= 0.0, lit(0L)).otherwise(
        greatest(lit(0L), least(lit((B - 1).toLong), floor((vc - loC) / wC))))
    val targets = ps.toDF("ps")
      .select($"ps".cast(DecimalType(3, 2)).as("pd"))
      .crossJoin(broadcast(stats))
      .select(kc ++ Seq($"pd", $"lo",
        ceil($"pd" * $"n").cast(LongType).as("rk"),
        (($"hi" - $"lo") / B).as("w1")): _*)
    // round 1: one per-group histogram serves every target of the group
    val h1 = base
      .join(broadcast(stats.select(kc ++ Seq($"lo",
        (($"hi" - $"lo") / B).as("w1")): _*)), kNames)
      .select(kc :+ bucket($"v", $"lo", $"w1").as("b1"): _*)
      .groupBy(kc :+ $"b1": _*).agg(count(lit(1)).as("c1"))
    // ≤|groups|·B-row frame: the cum window partitions by group — the
    // documented tiny-aggregate shape, never corpus-sized
    val cum1 = h1.withColumn("cum1",
      sum($"c1").over(Window.partitionBy(kc: _*).orderBy($"b1")))
    val t1 = targets.join(broadcast(cum1), kNames)
      .filter($"cum1" - $"c1" < $"rk" && $"rk" <= $"cum1")
      .select(kc ++ Seq($"pd", $"lo", $"w1", $"b1",
        ($"rk" - ($"cum1" - $"c1")).as("rk1"),
        ($"lo" + $"b1" * $"w1").as("blo"), ($"w1" / B).as("w2")): _*)
      .cache()
    tracked(t1)
    // round 2: histogram within each target's bucket (≤|ps|·n/B rows scan-side)
    val h2 = base.join(broadcast(t1), kNames)
      .filter(bucket($"v", $"lo", $"w1") === $"b1")
      .select(kc ++ Seq($"pd", bucket($"v", $"blo", $"w2").as("b2")): _*)
      .groupBy(kc ++ Seq($"pd", $"b2"): _*).agg(count(lit(1)).as("c2"))
    val cum2 = h2.withColumn("cum2",
      sum($"c2").over(Window.partitionBy(kc :+ $"pd": _*).orderBy($"b2")))
    val t2 = t1.join(broadcast(cum2), kNames :+ "pd")
      .filter($"cum2" - $"c2" < $"rk1" && $"rk1" <= $"cum2")
      .select(kc ++ Seq($"pd", $"lo", $"w1", $"b1", $"blo", $"w2", $"b2",
        ($"rk1" - ($"cum2" - $"c2")).as("rk2")): _*)
      .cache()
    tracked(t2)
    // final: each (group, b1, b2) slice holds ≤ n_g/B² rows — the only
    // sorted sets in the whole plan
    val wv = Window.partitionBy(kc :+ $"pd": _*).orderBy($"v")
    base.join(broadcast(t2), kNames)
      .filter(bucket($"v", $"lo", $"w1") === $"b1" &&
        bucket($"v", $"blo", $"w2") === $"b2")
      .withColumn("rn", row_number().over(wv))
      .filter($"rn" === $"rk2")
      .select(kc ++ Seq($"pd".cast(DoubleType).as("p"), $"v".as("value")): _*)
      .orderBy(kc :+ $"p": _*)
  }

  /** The ranked-orders frame both engines recurse over: one row per
    * order with its per-customer chain position.
    */
  private def RankedOrdersSql(ordersRel: String): String = s"""
      SELECT o_custkey AS cust,
             CAST(o_totalprice AS DECIMAL(14,2)) AS amt,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rk
      FROM $ordersRel"""

  /** The recursion over an already-available ranked relation (Spark runs
    * this against the CACHED g_ranked view — see q50's comment).
    * Remaining cost is DEPTH-bound, not data-bound: ~41 UnionLoop
    * iterations each pay one join stage's scheduling (a broadcast hint
    * on the ranked side measures no better — the per-iteration job
    * overhead dominates either join strategy at bench SF). That is the
    * honest price of set-based recursion on Spark; it is independent of
    * corpus size per iteration beyond the equi-join itself.
    */
  private def RecursiveChainSql(rankedRel: String): String = s"""
    WITH RECURSIVE chain(cust, rk, bal) AS (
      SELECT cust, rk, CAST(amt AS DECIMAL(18,2)) FROM $rankedRel WHERE rk = 1
      UNION ALL
      SELECT r.cust, r.rk,
             CAST(ROUND(c.bal * CAST(1.01 AS DECIMAL(5,2)) + r.amt, 2) AS DECIMAL(18,2))
      FROM chain c JOIN $rankedRel r ON r.cust = c.cust AND r.rk = c.rk + 1)
    SELECT cust, CAST(MAX(rk) AS BIGINT) AS n_orders,
           CAST(MAX(bal) AS DOUBLE) AS final_bal
    FROM chain GROUP BY cust ORDER BY cust"""

  /** One SQL text for the DuckDB oracle: the same ranked body + the same
    * chain recursion, as a single statement.
    */
  private def RecursiveBalanceSql(ordersRel: String): String = s"""
    WITH RECURSIVE ranked AS (${RankedOrdersSql(ordersRel)}),
    chain(cust, rk, bal) AS (
      SELECT cust, rk, CAST(amt AS DECIMAL(18,2)) FROM ranked WHERE rk = 1
      UNION ALL
      SELECT r.cust, r.rk,
             CAST(ROUND(c.bal * CAST(1.01 AS DECIMAL(5,2)) + r.amt, 2) AS DECIMAL(18,2))
      FROM chain c JOIN ranked r ON r.cust = c.cust AND r.rk = c.rk + 1)
    SELECT cust, CAST(MAX(rk) AS BIGINT) AS n_orders,
           CAST(MAX(bal) AS DOUBLE) AS final_bal
    FROM chain GROUP BY cust ORDER BY cust"""
}
