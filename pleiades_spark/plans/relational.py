"""Relational breadth over the TPC-H-ish star schema (SURVEY.md §7 M2).

The reference has no joins/windows/set-ops (SURVEY.md §2.6) — this module
supplies the standard relational coverage the engine needs to be a complete
analytics surface, expressed with built-in DataFrame ops so Catalyst owns
the physical plan.

Scale notes per query are inline; the recurring ones:
  * fact⋈fact joins (orders⋈lineitem) shuffle on the join key — at 100 TB
    both sides would be bucketed by orderkey at write time to skip it;
  * dim joins (nation/region/part/supplier at fixture scale) are broadcast
    hinted — no shuffle of the fact side;
  * every agg is a hash aggregate with map-side partial combine;
  * top-k uses row_number with a deterministic total order, never a full
    global sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark import catalog
from pleiades_spark.functions.hashing import MINHASH_PERMS, h32_sql, perm_hash_sql
from pleiades_spark.operators.sketch import (
    BLOOM_BITS,
    BLOOM_HASHES,
    CMS_DEPTH,
    CMS_WIDTH,
    bloom_bits_for,
    bloom_build,
    bloom_prune,
    bloom_prune_words,
    bloom_words_from_hashes,
    cms_heavy_hitters,
)
from pleiades_spark.operators.layout import zvalue, zvalue_sql
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, name)


# --- TPC-H Q1 shape: scan → filter → wide hash agg ---------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one pass over lineitem, 8 aggregates, 2 grouping keys.

    The filter reaches the parquet scan (PushedFilters) and only 7 of 11
    columns are read (ReadSchema) — verified via .explain("formatted").
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 shape: 3-way join → agg → deterministic top-k ------------------


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per order, top-10.

    customer is broadcast (small side); orders⋈lineitem shuffles on
    o_orderkey — the natural bucketing key at scale. Top-k is
    TakeOrderedAndProject via global_topk (per-partition heaps; the
    unpartitioned rank-window form would be a single-partition sort).
    """
    from pleiades_spark.functions.ranking import global_topk

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    rev = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    return global_topk(
        rev, 10, F.col("revenue").desc(), F.col("l_orderkey").asc(), rank_col="rk"
    ).select(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderpriority",
        "revenue",
        "rk",
    )


ORACLE_SHIPPING_PRIORITY = """
WITH rev AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority, revenue, rk
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rk FROM rev)
WHERE rk <= 10
"""


# --- TPC-H Q5 shape: snowflake join chain → agg ------------------------------


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way snowflake join, revenue by nation within one region.

    Round-7 sf10 lesson (75 → 6 s): push the REGION filter down BOTH
    dimension paths before any fact join. nation⋈region('ASIA') is 5
    keys; semi-reducing customer and supplier to the ASIA subset first
    means the o_custkey join moves 1/5 of the customers and the
    broadcast supplier probe drops 4/5 of lineitem BEFORE the orderkey
    shuffle. The old shape (broadcast the FULL 0.15·SF customer table,
    filter by region after all joins) force-broadcast a scaling table —
    at sf10 a 1.5M-row build and a 5× wider fact stream; at 100 TB a
    driver OOM. The c_nationkey = s_nationkey equality rides the
    orderkey join as a second equi-condition, so Catalyst keeps it in
    the hash join. Shuffles: orders⋈customer_asia on custkey,
    lineitem_asia⋈oc on (orderkey, nationkey), final 25-key agg.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust_a = cust.join(
        F.broadcast(asia.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    supp_a = supp.join(
        F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    oc = orders.join(cust_a, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    lin = li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    lis = lin.join(F.broadcast(supp_a), F.col("l_suppkey") == F.col("s_suppkey"))
    joined = lis.join(
        oc,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- semi / anti joins --------------------------------------------------------


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no URGENT order.

    (Filtered on the right side so the result is non-empty at every SF —
    every fixture customer has at least one order.)
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_nations_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) through a 2-hop lookup + agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    nation = _t(spark, sf_dir, "nation")
    big_cust = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return (
        big_cust.join(F.broadcast(nation), big_cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_NATIONS_WITH_BIG_ORDERS = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY n_name
"""


# --- outer join + null handling ----------------------------------------------


def q_order_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join orders→lineitem with null-aware aggregation
    (TPC-H Q13 shape: distribution of lineitem counts per order)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left"
    ).groupBy("o_orderkey").agg(F.count("l_linenumber").alias("n_items"))
    return per_order.groupBy("n_items").agg(F.count(F.lit(1)).alias("n_orders"))


ORACLE_ORDER_FILL_RATE = """
SELECT n_items, count(*) AS n_orders FROM (
  SELECT o_orderkey, count(l_linenumber) AS n_items
  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey
) GROUP BY n_items
"""


# --- set operations ------------------------------------------------------------


def q_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over derived key sets, tagged per-op.

    Sets: customers with an URGENT order vs customers with a '1998+' order.
    """
    cust_urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    cust_late = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return (
        cust_urgent.intersect(cust_late).select(F.lit("both").alias("op"), "custkey")
        .unionAll(
            cust_urgent.exceptAll(cust_late).select(
                F.lit("urgent_only").alias("op"), "custkey"
            )
        )
        .unionAll(
            cust_late.exceptAll(cust_urgent).select(
                F.lit("late_only").alias("op"), "custkey"
            )
        )
    )


ORACLE_SEGMENT_SET_OPS = """
WITH u AS (SELECT DISTINCT o_custkey AS custkey FROM orders
           WHERE o_orderpriority = '1-URGENT'),
     l AS (SELECT DISTINCT o_custkey AS custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1999-01-01')
SELECT 'both' AS op, custkey FROM (SELECT custkey FROM u INTERSECT SELECT custkey FROM l)
UNION ALL
SELECT 'urgent_only' AS op, custkey FROM (SELECT custkey FROM u EXCEPT SELECT custkey FROM l)
UNION ALL
SELECT 'late_only' AS op, custkey FROM (SELECT custkey FROM l EXCEPT SELECT custkey FROM u)
"""


# --- window functions: running totals, rank, lag ------------------------------


def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total + order sequence + gap since the
    previous order (window frame rowsBetween, row_number, lag).

    One shuffle on o_custkey serves all three window functions (same
    partitioning + ordering).
    """
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.row_number().over(w).alias("order_seq"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 4
        ).alias("running_total"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)
        ).alias("days_since_prev"),
    )


ORACLE_CUSTOMER_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       row_number() OVER w AS order_seq,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
       datediff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — partitioned top-k
    (the scale-safe form: no global sort, k rows kept per partition)."""
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
    )


ORACLE_TOP_PARTS_PER_BRAND = """
SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
) WHERE rk <= 3
"""


# --- rollup / cube (multi-grain aggregation) -----------------------------------


def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority) — the generalized form of the reference's
    dual-grain counter families (all-time + per-day ≡ rollup grains)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


ORACLE_ORDER_PRIORITY_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus) with grouping_id — every subtotal
    grain in one pass (2^k grouping sets via a single Expand + agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
    )


ORACLE_LINEITEM_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       round(sum(l_extendedprice), 4) AS revenue,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- pivot (conditional aggregation) -------------------------------------------


def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status → columns per priority (oracle = conditional agg;
    Spark's pivot plans to exactly that)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
    )


ORACLE_STATUS_PIVOT = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS "O",
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS "F",
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority
"""


# --- scalar function breadth ----------------------------------------------------


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar coverage in one projection (all
    whole-stage-codegen'd, no UDFs)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("prio_num"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.round(F.sqrt(F.col("o_totalprice")), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice")), 4).alias("price_ln"),
        F.round(F.pow(F.col("o_totalprice"), F.lit(0.25)), 4).alias("price_pow"),
        F.abs(F.col("o_totalprice") - 100000).alias("price_dev"),
        (F.col("o_totalprice") % 1000).cast("double").alias("price_mod"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("price_floor50k"),
    )


# DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → +1 to align.
ORACLE_SCALAR_FUNCTIONS = """
SELECT o_orderkey,
       upper(o_orderstatus) AS status_upper,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
       length(o_orderpriority) AS prio_len,
       concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
       round(sqrt(o_totalprice), 4) AS price_sqrt,
       round(ln(o_totalprice), 4) AS price_ln,
       round(pow(o_totalprice, 0.25), 4) AS price_pow,
       abs(o_totalprice - 100000) AS price_dev,
       CAST(o_totalprice % 1000 AS DOUBLE) AS price_mod,
       greatest(o_totalprice, 50000.0) AS price_floor50k
FROM orders WHERE o_orderkey % 100 = 0
"""


# --- distinct counting: exact + approximate --------------------------------------


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) per group (expand + two-phase agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_DISTINCT_COUNTS = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distincts. Sketch internals differ across engines, so the driver runs
    the rows-only check (no oracle); exactness is covered by
    ``distinct_counts``. A sanity test asserts <5% error vs exact."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts")
    )


# --- exact percentiles (interpolated) --------------------------------------------


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group.

    At 100 TB these become approx_percentile (t-digest); exact is kept here
    because it is oracle-checkable (Spark percentile ≡ DuckDB
    quantile_cont).
    """
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


ORACLE_PRICE_PERCENTILES = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi
FROM orders GROUP BY o_orderstatus
"""


# --- correlated scalar subquery shape (decorrelated by Catalyst) ------------------


def q_above_avg_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows above 1.3× their group average — written as a
    join against a pre-aggregated subquery (the decorrelated plan Catalyst
    would produce; avoids per-row subquery execution at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") > 1.3 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.sum("l_extendedprice"), 4).alias("price_above"),
        )
    )


ORACLE_ABOVE_AVG_LINEITEMS = """
SELECT l_partkey, count(*) AS n_above, round(sum(l_extendedprice), 4) AS price_above
FROM lineitem l1
WHERE l_quantity > 1.3 * (SELECT avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l1.l_partkey)
GROUP BY l_partkey
"""


# --- CASE-heavy conditional aggregation (TPC-H Q8/Q12 shape) -----------------------


def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional sums inside one aggregation pass (TPC-H Q12 shape)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


ORACLE_PRIORITY_SHIPMODE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


# --- TPC-H Q4 shape: correlated EXISTS → semi join ---------------------------


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (in a quarter) having at least one late-shipped lineitem —
    the correlated-EXISTS pattern as a left-semi join (Catalyst's
    decorrelated form), counted per priority."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # "late" ≡ shipped more than 90 days after order date — the correlation
    # lives in the join condition, so the semi join carries both predicates.
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --- TPC-H Q7 shape: bi-nation volume with derived year ----------------------


def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation → customer-nation trade volume per year for two
    nation pairs (join chain + expression grouping key).

    Round-7 sf10 lesson (same family as local_supplier_volume): the two
    interesting nations are known BEFORE any join, so reduce supplier
    and customer to those nations first — the broadcast supplier probe
    then drops ~92 % of lineitem before the orderkey shuffle, and the
    custkey join moves ~8 % of the customers — instead of
    force-broadcasting the full 0.15·SF customer table and filtering
    the nation pair after five joins. The OR-of-pairs predicate stays a
    post-join filter (it is not an equi-key), but it now filters an
    already nation-pruned stream.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    pair = ("NATION_3", "NATION_7")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("s_nkey"),
                F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("c_nkey"),
                F.col("n_name").alias("cust_nation"))
    )
    supp_f = supp.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    ).select("s_suppkey", "supp_nation")
    cust_f = cust.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    ).select("c_custkey", "cust_nation")
    oc = orders.join(cust_f, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    lin = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    lis = lin.join(F.broadcast(supp_f), F.col("l_suppkey") == F.col("s_suppkey"))
    joined = lis.join(oc, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        (
            (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
        )
        | (
            (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "volume"
        )
    )


ORACLE_NATION_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year, round(sum(vol), 4) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- TPC-H Q2 shape: correlated MIN subquery ---------------------------------


def q_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced at their brand's minimum — correlated scalar-MIN
    subquery in its decorrelated form (pre-aggregate ⋈ equi-join), the
    plan Catalyst produces for TPC-H Q2's min(ps_supplycost) pattern."""
    part = _t(spark, sf_dir, "part")
    brand_min = part.groupBy(F.col("p_brand").alias("bm_brand")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(brand_min),
            (part.p_brand == F.col("bm_brand"))
            & (part.p_retailprice == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


ORACLE_CHEAPEST_PART_PER_BRAND = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM part p1
WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
                       WHERE p2.p_brand = p1.p_brand)
"""


# --- statistical aggregates ---------------------------------------------------


def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation per group (Welford-style distributed
    moments — single pass, map-side combinable)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias(
            "price_disc_covar"
        ),
    )


ORACLE_STATS_AGGREGATES = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
       round(covar_samp(l_extendedprice, l_discount), 4) AS price_disc_covar
FROM lineitem GROUP BY l_returnflag
"""


# --- unpivot (wide → long) -----------------------------------------------------


def q_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot back to long form (melt) — the wide table comes
    from q_status_pivot, the unpivot is the built-in DataFrame.unpivot."""
    wide = q_status_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["O", "F", "P"],
        variableColumnName="status",
        valueColumnName="n",
    )


ORACLE_STATUS_UNPIVOT = """
SELECT o_orderpriority, status, CAST(n AS BIGINT) AS n
FROM (
  SELECT o_orderpriority,
         CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS "O",
         CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS "F",
         CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS "P"
  FROM orders GROUP BY o_orderpriority
) UNPIVOT (n FOR status IN ("O", "F", "P"))
"""


# --- TPC-H completion (adapted to the fixture schema) ------------------------
#
# The fixture star schema lacks partsupp, l_commitdate/l_receiptdate,
# p_container/p_mfgr and c_phone, so the remaining TPC-H queries are
# re-stated to exercise the same PLAN SHAPES (the thing that matters for
# engine coverage) on the columns that exist. Each docstring names the
# original query and what was adapted.


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg — revenue increase if discounts
    were dropped. All three predicates push to the parquet scan; the
    aggregation is a single partial+final sum with no grouping key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue_effect"
            )
        )
    )


ORACLE_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue_effect
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way join, profit per (nation, year).

    Adapted: no partsupp, so supply cost is proxied as 60 % of
    p_retailprice. part/supplier/nation broadcast; the only fact-fact
    shuffle is lineitem⋈orders on orderkey (the natural bucket key).

    Join ORDER matters at scale (round-7 sf10 finding): the orderkey
    SMJ must see the NARROW projected lineitem — broadcasting the dims
    first widened every shuffled row with part/supplier/nation payloads
    and the same SMJ took 119.9 s at sf10 (60M lineitem) vs 25.0 s with
    orders joined first (the original form measured 50.1 s in-sweep).
    Explicit projections keep the sort rows at 6 columns; the dim
    broadcasts then enrich the already-joined stream map-side."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
    )


ORACLE_PRODUCT_TYPE_PROFIT = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    half-year window. customer/nation broadcast into the fact agg; top-k
    is TakeOrderedAndProject via global_topk (per-partition heaps, no
    single-partition rank window)."""
    from pleiades_spark.functions.ranking import global_topk

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    return global_topk(
        rev, 20, F.col("revenue").desc(), F.col("c_custkey").asc(), rank_col="rk"
    ).select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "rk")


ORACLE_RETURNED_ITEM_REVENUE = """
WITH rev AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name, rk
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rk FROM rev)
WHERE rk <= 20
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group → filter by a fraction of the GLOBAL total
    (scalar subquery). Adapted: part 'stock value' comes from lineitem
    revenue (no partsupp). The global total is a 1-row aggregate joined
    by broadcast cross join — no driver round-trip, no collect."""
    li = _t(spark, sf_dir, "lineitem")
    value = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # Carry the UNROUNDED sum alongside the display-rounded part_value and
    # compute share/threshold from it, mirroring the oracle's pv CTE — a
    # share built from the 4-dp-rounded value can flip rows that land on a
    # 6-dp rounding boundary across engines.
    per_part = li.groupBy("l_partkey").agg(
        F.round(value, 4).alias("part_value"), value.alias("raw_value")
    )
    total = li.agg(value.alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.round(F.col("raw_value") / F.col("total_value"), 6) > 0.00055
        )
        .select(
            "l_partkey",
            "part_value",
            F.round(F.col("raw_value") / F.col("total_value"), 6).alias("share"),
        )
    )


ORACLE_IMPORTANT_PARTS = """
WITH pv AS (
  SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS part_value,
         sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT sum(l_extendedprice * (1 - l_discount)) AS total_value FROM lineitem
)
SELECT l_partkey, part_value, round(raw_value / total_value, 6) AS share
FROM pv, tot
WHERE round(raw_value / total_value, 6) > 0.00055
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share — conditional numerator over an
    unconditional denominator in ONE aggregation pass (no self-join)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


ORACLE_PROMO_REVENUE = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the MAX quarterly revenue — the
    'join against your own aggregate' pattern (view + scalar max). The
    1-row max broadcasts; equality on the ROUNDED revenue so both
    engines agree bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    sr = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    mx = sr.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        sr.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_TOP_SUPPLIER = """
WITH sr AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM sr JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM sr)
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders under half a part's average
    quantity — the correlated-average decorrelated into a per-part agg
    re-joined to the fact (the scan happens twice; at 100 TB the inner
    agg is tiny and broadcasts back against the bucketed fact)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    thr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(thr), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


ORACLE_SMALL_QTY_REVENUE = """
WITH thr AS (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thr ON l_partkey = pk
WHERE p_brand = 'Brand#2' AND l_quantity < half_avg_qty
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity threshold
    — HAVING on a fact agg, then joins back to orders/customer. The
    heavy agg groups on the bucket key (orderkey); the HAVING survivors
    are tiny and broadcast into the enrichment joins."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


ORACLE_LARGE_VOLUME_CUSTOMERS = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate (brand × size-range ×
    quantity-range disjuncts). Adapted to p_brand/p_size (no container/
    shipmode columns). Catalyst CNF-converts the disjunction so the
    common l_partkey = p_partkey conjunct still drives the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    d1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    d2 = (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    d3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.filter(d1 | d2 | d3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who 'kept orders waiting'. Adapted (no
    commit/receipt dates): on finalized multi-supplier orders, the
    supplier of the LATEST ship line held the order up. The EXISTS /
    NOT-EXISTS pair becomes per-order window aggregates (max shipdate +
    distinct suppliers ≥ 2) evaluated in ONE pass over the finalized
    lines (r13 — the r12 shape consumed `flines` twice: each reference
    re-ran the lineitem⋈orders join, then paid a second orderkey
    shuffle to join the per-order aggregates back; the window form
    shuffles the joined lines by orderkey once and filters in place),
    then a tiny top-10."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    flines = li.join(
        orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    from pyspark.sql.window import Window as W

    wo = W.partitionBy("l_orderkey")
    waiters = (
        flines.select(
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            F.max("l_shipdate").over(wo).alias("max_ship"),
            F.size(F.collect_set("l_suppkey").over(wo)).alias("n_supps"),
        )
        .filter(
            (F.col("n_supps") >= 2) & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    from pleiades_spark.functions.ranking import global_topk

    counted = waiters.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    named = counted.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    return global_topk(
        named, 10, F.col("numwait").desc(), F.col("s_name").asc(), rank_col="rk"
    ).select("s_name", "numwait", "rk")


ORACLE_WAITING_SUPPLIERS = """
WITH flines AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS ok, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_supps
  FROM flines GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2
), waiters AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM flines JOIN per_order ON l_orderkey = ok AND l_shipdate = max_ship
), counted AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait FROM waiters GROUP BY l_suppkey
)
SELECT s_name, numwait, rk FROM (
  SELECT s_name, numwait,
         row_number() OVER (ORDER BY numwait DESC, s_name ASC) AS rk
  FROM counted JOIN supplier ON l_suppkey = s_suppkey
) WHERE rk <= 10
"""


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, grouped by nation. Adapted: 'no orders in 7 years' → no
    orders since 2000-01-01 (every fixture customer has SOME order), and
    nation stands in for the phone country code. Scalar-subquery average
    broadcast + anti join + dim rollup in one declarative plan."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    nation = _t(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


ORACLE_SALES_OPPORTUNITY = """
SELECT n_name AS nation, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY n_name
"""


# --- Count-Min Sketch heavy hitters -----------------------------------------

CMS_TOPK = 20


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part keys by CMS-ESTIMATED line count (operators/sketch.py).
    The estimates carry the sketch's deterministic collision error, which
    the oracle reproduces cell-for-cell."""
    li = _t(spark, sf_dir, "lineitem")
    return cms_heavy_hitters(
        li, F.col("l_partkey").cast("string"), "part_key", k=CMS_TOPK
    )


def _cms_cells_sql(src: str, width: int) -> str:
    return " UNION ALL ".join(
        f"SELECT {r} AS row, "
        f"{perm_hash_sql('h', *MINHASH_PERMS[r])} % {width} AS bucket, k "
        f"FROM {src}"
        for r in range(CMS_DEPTH)
    )


ORACLE_HEAVY_HITTERS_CMS = f"""
WITH hashed AS (
  SELECT CAST(l_partkey AS VARCHAR) AS k,
         {h32_sql("CAST(l_partkey AS VARCHAR)")} AS h
  FROM lineitem
), cells AS ({_cms_cells_sql("hashed", CMS_WIDTH)}),
sketch AS (
  SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY row, bucket
), dk AS (SELECT DISTINCT k, h FROM hashed),
probes AS ({_cms_cells_sql("dk", CMS_WIDTH)}),
est AS (
  SELECT k, min(cnt) AS est
  FROM probes JOIN sketch USING (row, bucket) GROUP BY k
)
SELECT k AS part_key, CAST(est AS BIGINT) AS est,
       CAST(row_number() OVER (ORDER BY est DESC, k ASC) AS INT) AS rk
FROM est ORDER BY est DESC, k ASC LIMIT {CMS_TOPK}
"""


# --- Bloom-filter join pruning ----------------------------------------------

BLOOM_PRICE_MIN = 480_000


def q_bloom_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built from high-value orders pre-filters lineitem
    before the true membership check — explicit, engine-portable form of
    runtime bloom join pruning, false positives counted deterministically."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # ONE collect feeds both the size choice and the bitmap: the bitmap
    # has to land on the driver regardless (it ships into the fact scan
    # as a literal), but the md5 runs EXECUTOR-side (h32 inside the dim
    # scan) — the driver receives one pre-hashed bigint per key and does
    # only the k integer perms (bloom_words_from_hashes), so its cost no
    # longer scales with md5 throughput if the dim grows to millions.
    from pleiades_spark.functions.hashing import h32

    dim = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    hashes = [r["h"] for r in dim.select(h32(F.col("k")).alias("h")).collect()]
    # Size the filter from the build side (bloom_bits_for): the ≤606-key
    # gate fixture stays at the frozen BLOOM_BITS floor region the
    # oracle's bsize subquery replays; bigger dims get a bigger bitmap
    # instead of a saturated one.
    bits = bloom_bits_for(len(hashes))
    words = bloom_words_from_hashes(hashes, bits)
    fact = li.select(
        F.col("l_orderkey").cast("string").alias("k"), "l_extendedprice"
    )
    pruned = bloom_prune_words(fact, F.col("k"), words, bits)
    # Mark join re-derives dim from the (cached-by-OS) orders scan — a
    # driver createDataFrame of the collected keys measures ~2.5s slower
    # here: parallelize ships 32 Python-pickled partitions vs one
    # columnar re-scan of a dim that pushes its filter down.
    marked = pruned.join(
        F.broadcast(dim.withColumn("hit", F.lit(1))), "k", "left"
    )
    hit = F.coalesce(F.col("hit"), F.lit(0))
    return marked.agg(
        F.count(F.lit(1)).alias("n_pass"),
        F.sum(hit).alias("n_true"),
        F.sum(F.lit(1) - hit).alias("n_false_pos"),
        F.round(F.sum("l_extendedprice"), 4).alias("passed_revenue"),
    )


# The oracle replays the ADAPTIVE sizing (bloom_bits_for): m = the
# smallest power of two ≥ 10·|dim| with a 4096 floor, as a scalar
# subquery — so Spark and DuckDB agree on m at every scale factor, not
# just the one the constant was frozen for. (10·n is divisible by 10 so
# it is never itself a power of two; ceil(log2) is exact.)
_BLOOM_POS_EXPRS = [
    perm_hash_sql("h", *MINHASH_PERMS[CMS_DEPTH + i])
    + " % (SELECT m FROM bsize)"
    for i in range(BLOOM_HASHES)
]

ORACLE_BLOOM_SEMI_PRUNE = f"""
WITH dim AS (
  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
  WHERE o_totalprice > {BLOOM_PRICE_MIN}
), bsize AS (
  SELECT GREATEST({BLOOM_BITS},
                  CAST(pow(2, CEIL(log2(count(*) * 10))) AS BIGINT)) AS m
  FROM dim
), dh AS (SELECT k, {h32_sql("k")} AS h FROM dim),
pos AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {e} AS pos FROM dh" for e in _BLOOM_POS_EXPRS)}
  )
), fh AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, l_extendedprice,
         {h32_sql("CAST(l_orderkey AS VARCHAR)")} AS h
  FROM lineitem
), fp AS (
  SELECT k, l_extendedprice,
         {", ".join(f"{e} AS p{i}" for i, e in enumerate(_BLOOM_POS_EXPRS))}
  FROM fh
), pass AS (
  SELECT * FROM fp
  WHERE {" AND ".join(f"p{i} IN (SELECT pos FROM pos)" for i in range(BLOOM_HASHES))}
)
SELECT CAST(count(*) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN k IN (SELECT k FROM dim) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true,
       CAST(sum(CASE WHEN k IN (SELECT k FROM dim) THEN 0 ELSE 1 END) AS BIGINT)
         AS n_false_pos,
       round(sum(l_extendedprice), 4) AS passed_revenue
FROM pass
"""


def q_bloom_semi_prune_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION hash-family twin of q_bloom_semi_prune: the bitmap and
    the fact-side probe use xxhash64 (h32_prod — JVM intrinsic, no hex
    round-trip) instead of the oracle-replayable md5-h32, then an exact
    broadcast semi join drops the false positives. Bloom filters have no
    false NEGATIVES, so the final aggregate is hash-family-independent —
    which is what lets a non-DuckDB-reproducible hash keep a FULL value
    gate: the oracle just computes the exact semi-join aggregate.

    This is the deployment configuration (CLAUDE.md invariant: gate
    sketches stay on md5 so their ERROR replays; here the error is
    verified away in-plan, so the cheap hash is safe). Same map-side
    bitmap shape as the gate twin — plan guard shares
    test_scale_plans.py's no-join-prune check pattern.
    """
    from pleiades_spark.functions.hashing import h32_prod

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dim = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    hashes = [
        r["h"] for r in dim.select(h32_prod(F.col("k")).alias("h")).collect()
    ]
    bits = bloom_bits_for(len(hashes))
    words = bloom_words_from_hashes(hashes, bits)
    fact = li.select(
        F.col("l_orderkey").cast("string").alias("k"), "l_extendedprice"
    )
    pruned = bloom_prune_words(fact, F.col("k"), words, bits, hfn=h32_prod)
    # Exact verify: inner broadcast join — false positives (the only rows
    # a hash-family change can move) are dropped here, so n_match /
    # matched_revenue equal the plain semi join bit-for-bit.
    matched = pruned.join(F.broadcast(dim), "k")
    return matched.agg(
        F.count(F.lit(1)).alias("n_match"),
        F.round(F.sum("l_extendedprice"), 4).alias("matched_revenue"),
    )


ORACLE_BLOOM_SEMI_PRUNE_PROD = f"""
SELECT CAST(count(*) AS BIGINT) AS n_match,
       round(sum(l_extendedprice), 4) AS matched_revenue
FROM lineitem
WHERE CAST(l_orderkey AS VARCHAR) IN (
  SELECT DISTINCT CAST(o_orderkey AS VARCHAR)
  FROM orders WHERE o_totalprice > {BLOOM_PRICE_MIN}
)
"""


def q_window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface in one gate: rank, dense_rank, percent_rank,
    cume_dist, ntile, lead, lag, nth_value over a single per-brand
    ordering — ONE Window spec, so the plan sorts each partition once
    and evaluates every function in the same pass."""
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    out = part.select(
        "p_brand",
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("p_retailprice", 1).over(w).alias("next_price"),
        F.lag("p_retailprice", 1).over(w).alias("prev_price"),
        F.nth_value("p_retailprice", 2).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("second_cheapest"),
    )
    return out.filter(F.col("rnk") <= 5)


ORACLE_WINDOW_FUNCTION_BREADTH = """
SELECT * FROM (
  SELECT p_brand, p_partkey, p_retailprice AS price,
         CAST(rank() OVER w AS INT) AS rnk,
         CAST(dense_rank() OVER w AS INT) AS drnk,
         round(percent_rank() OVER w, 6) AS prnk,
         round(cume_dist() OVER w, 6) AS cdist,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         lead(p_retailprice, 1) OVER w AS next_price,
         lag(p_retailprice, 1) OVER w AS prev_price,
         nth_value(p_retailprice, 2) OVER
           (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS second_cheapest
  FROM part
  WINDOW w AS (PARTITION BY p_brand
               ORDER BY p_retailprice ASC, p_partkey ASC)
) WHERE rnk <= 5
"""



MEDIAN_BUCKET_STEP = 64.0  # power of two: v/STEP is exact in binary


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median of extended price per return flag, weighted
    by quantity — the order statistic percentile_cont can't express
    (each row counts qty times). The answer is min{v : 2·W(v) ≥ W_tot}
    with W(v) the cumulative weight through v — integer comparisons all
    the way, so no float boundary exists to diverge on.

    Scale shape — two-phase bucket refinement, NOT a per-group sort:
    l_returnflag has 3 values, so a cumulative window straight over the
    rows is three single-task sorts of a third of the table each (the
    same constant-cardinality trap as the RFM ntile fix). Instead:
    (1) aggregate weight per (flag, v) — ties collapse, one shuffle;
    (2) aggregate again per (flag, floor(v/64)) price bucket and take
        the bucket-grain running sum — the window sees ~1.6k rows per
        group at ANY data size (the price domain is fixed; shrink the
        power-of-two step if the domain grows), locating the single
        bucket that contains the weighted midpoint;
    (3) rerun the running sum INSIDE that one bucket only (distinct
        values per 64-wide band, ~1/1600 of the value space), offset by
        the prior buckets' weight from phase 2.
    Same integer threshold, same answer, windows only ever over
    aggregation-grain row counts. The oracle keeps the direct
    one-window form — both compute min v with 2·W(v) ≥ W_tot."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    per_v = rows.groupBy("l_returnflag", "v").agg(F.sum("w").alias("wv"))
    # total weight re-aggregated from per_v (Σ wv per flag ≡ Σ w per
    # flag — integer sums, associative): the row-grain groupBy over a
    # third lineitem scan becomes a |per_v|-grain groupBy whose per_v
    # subtree is canonically identical to the other branches, so runtime
    # ReuseExchange shares one scan+partial-agg (r13 opt).
    tot = per_v.groupBy("l_returnflag").agg(F.sum("wv").alias("tot"))

    bucketed = per_v.withColumn(
        "b", F.floor(F.col("v") / MEDIAN_BUCKET_STEP).cast("long")
    )
    per_b = bucketed.groupBy("l_returnflag", "b").agg(F.sum("wv").alias("wb"))
    bwin = (
        W.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    with_cum = per_b.join(tot, "l_returnflag").withColumn(
        "cum_b", F.sum("wb").over(bwin)
    )
    # first bucket whose cumulative weight crosses the midpoint, plus the
    # weight of everything before it
    target = (
        with_cum.filter(2 * F.col("cum_b") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("b").alias("b_star"),
            F.min_by(F.col("cum_b") - F.col("wb"), F.col("b")).alias("prior"),
            F.min("tot").alias("tot"),
        )
    )
    vwin = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(target), "l_returnflag")
        .filter(F.col("b") == F.col("b_star"))
        .withColumn("cum_v", F.sum("wv").over(vwin))
        .filter(2 * (F.col("prior") + F.col("cum_v")) >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.min("tot").alias("total_weight"),
        )
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH rows_w AS (
  SELECT l_returnflag, l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), marked AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag
                      ORDER BY v ASC, w ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM rows_w
)
SELECT l_returnflag, min(v) AS weighted_median,
       CAST(max(tot) AS BIGINT) AS total_weight
FROM marked WHERE 2 * cum >= tot
GROUP BY l_returnflag
"""



def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per return flag from explicit power
    sums (Σx, Σx², Σx³, Σx⁴) — computed from the SAME moment formula on
    both engines, because the built-in skewness()/kurtosis() disagree
    across engines on sample-vs-population corrections. One aggregation
    pass; the standardized moments divide before rounding."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * F.col("s2") / n + 2 * m * m * m
    m4 = (
        F.col("s4") / n
        - 4 * m * F.col("s3") / n
        + 6 * m * m * F.col("s2") / n
        - 3 * m * m * m * m
    )
    return agg.select(
        "l_returnflag",
        F.col("n"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness_pop"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("excess_kurtosis_pop"),
    )


# Every moment expression below is the SAME left-associated
# multiplication chain the Spark side builds (2*m*m*m, not 2*pow(m,3);
# m2*m2, not pow(m2,2)): pow() may round differently from repeated
# multiplication, and a one-ulp divergence can flip round(...,6) at a
# boundary. Only pow(x, 1.5) remains — it appears verbatim on both sides.
ORACLE_HIGHER_MOMENTS = """
WITH agg AS (
  SELECT l_returnflag, count(*) AS n,
         sum(l_extendedprice) AS s1,
         sum(l_extendedprice * l_extendedprice) AS s2,
         sum(l_extendedprice * l_extendedprice * l_extendedprice) AS s3,
         sum(l_extendedprice * l_extendedprice * l_extendedprice
             * l_extendedprice) AS s4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round((s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness_pop,
       round((s4 / n - 4 * (s1 / n) * s3 / n
              + 6 * (s1 / n) * (s1 / n) * s2 / n
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
         AS excess_kurtosis_pop
FROM agg
"""



SAMPLED_Q_K = 500


def q_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles from a DETERMINISTIC bottom-k hash sample
    — the quantile member of the engine-stable sketch family (CMS,
    Bloom, KMV, MinHash, SimHash, SRP): h32 of the row key is a uniform
    [0,2³²) draw, so the k smallest hashes are a uniform k-sample, and
    type-1 quantiles of that sample are integer-indexed order statistics
    — every approximation error replayed exactly by the oracle, where
    t-digest/GK sketches (percentile_approx) are engine-private.

    Scale: ORDER BY hash LIMIT k compiles to TakeOrderedAndProject
    (per-partition heaps of k, driver merge) — one pass, no global sort,
    mergeable exactly like KMV. Error ~ O(1/√k) in rank."""
    from pleiades_spark.functions.hashing import h32

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"), F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    sample = (
        li.select(F.col("l_extendedprice").alias("v"), h32(key).alias("h"))
        .orderBy(F.col("h").asc(), F.col("v").asc())
        .limit(SAMPLED_Q_K)
    )
    arr = F.sort_array(F.collect_list("v"))
    idx = lambda q: int(-(-q * SAMPLED_Q_K // 100))  # ceil, 1-based  # noqa: E731
    return sample.agg(
        F.count(F.lit(1)).alias("k"),
        F.element_at(arr, idx(10)).alias("p10"),
        F.element_at(arr, idx(50)).alias("p50"),
        F.element_at(arr, idx(90)).alias("p90"),
        F.element_at(arr, idx(99)).alias("p99"),
    )


ORACLE_SAMPLED_PERCENTILES = f"""
WITH sample AS (
  SELECT l_extendedprice AS v
  FROM (
    SELECT l_extendedprice,
           CAST('0x' || substring(md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))), 1, 8) AS BIGINT) AS h
    FROM lineitem
  )
  ORDER BY h ASC, l_extendedprice ASC
  LIMIT {SAMPLED_Q_K}
), arr AS (SELECT list(v ORDER BY v ASC) AS a FROM sample)
SELECT CAST(len(a) AS BIGINT) AS k,
       a[{-(-10 * SAMPLED_Q_K // 100)}] AS p10,
       a[{-(-50 * SAMPLED_Q_K // 100)}] AS p50,
       a[{-(-90 * SAMPLED_Q_K // 100)}] AS p90,
       a[{-(-99 * SAMPLED_Q_K // 100)}] AS p99
FROM arr
"""



GROUP_SAMPLE_K = 200


def q_grouped_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP deterministic quantile sample: bottom-k hash draws
    within each return flag (window rank on h32 instead of the global
    TakeOrdered), then integer-indexed order statistics per group —
    the keyed form of q_sampled_percentiles, i.e. one small fixed-size
    quantile summary per key no matter how skewed the key sizes."""
    from pleiades_spark.functions.hashing import h32

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"), F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    sample = (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            h32(key).alias("h"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= GROUP_SAMPLE_K)
    )
    arr = F.sort_array(F.collect_list("v"))
    idx = lambda q: int(-(-q * GROUP_SAMPLE_K // 100))  # noqa: E731
    return sample.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("k"),
        F.element_at(arr, idx(25)).alias("p25"),
        F.element_at(arr, idx(50)).alias("p50"),
        F.element_at(arr, idx(75)).alias("p75"),
    )


ORACLE_GROUPED_SAMPLED_QUANTILES = f"""
WITH sample AS (
  SELECT l_returnflag, v FROM (
    SELECT l_returnflag, l_extendedprice AS v,
           row_number() OVER (PARTITION BY l_returnflag
             ORDER BY CAST('0x' || substring(md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))), 1, 8) AS BIGINT) ASC, l_extendedprice ASC) AS rn
    FROM lineitem
  ) WHERE rn <= {GROUP_SAMPLE_K}
), arr AS (
  SELECT l_returnflag, list(v ORDER BY v ASC) AS a
  FROM sample GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(len(a) AS BIGINT) AS k,
       a[{-(-25 * GROUP_SAMPLE_K // 100)}] AS p25,
       a[{-(-50 * GROUP_SAMPLE_K // 100)}] AS p50,
       a[{-(-75 * GROUP_SAMPLE_K // 100)}] AS p75
FROM arr
"""


def q_salted_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier volume through a SALTED equi-join (operators/skew.py
    salted_equi_join): fact salt from the high-cardinality orderkey, dim
    replicated ×16, join on (suppkey, salt). The oracle replays a PLAIN
    join — proving salting-invariance, the property that lets production
    swap the salted form in under a skewed key without changing results."""
    from pleiades_spark.operators.skew import salted_equi_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_equi_join(li, supp, "l_suppkey", F.col("l_orderkey"))
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


ORACLE_SALTED_SUPPLIER_JOIN = """
SELECT s_name, CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


FUZZY_MAX_DIST = 3


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: near-identical part names
    within a brand block — the fuzzy-join shape of catalog/record
    de-duplication.

    Scale shape (three stages, none quadratic in ROWS):

    1. The expensive function runs on DISTINCT names only. A catalog's
       name vocabulary grows sublinearly (the fixture has 64 distinct
       names over 20k..200k rows), so per-row-pair Levenshtein — the
       naive blocked nested-loop, quadratic within a block because
       p_brand has a FIXED 25 values at every SF — wastes >99% of its
       work re-comparing identical strings. Compute-once-on-distinct,
       re-expand is the idiomatic columnar move (measured 7.2s -> 1.3s at
       sf0.1 vs the blocked nested-loop form).
    2. The vocab×vocab stage goes through the PassJoin segment-signature
       operator (operators/editdist.py): pigeonhole blocking turns
       candidate generation into an equi-join, so even a multi-million-
       name vocabulary at 100 TB never enumerates all name pairs.
       (Distinct inputs are exactly where PassJoin shines — the raw
       table's duplicate explosion can't inflate its candidates.)
    3. Re-expansion is a broadcast of the vocab-pair map onto the rows
       and one hash join on (brand, name): everything after the
       broadcast is output-bound, and the output — all qualifying row
       pairs — is the irreducible floor of the exact semantics.

    Both engines implement plain Levenshtein, so distances hash-match.

    DEMOTED round 9 (verdict #2): this row-expanded pair grain is
    output-bound enumeration — 2.30 B rows at sf10 on the fixture's
    64-name vocabulary, the worst sweep cell — and no 100 TB user asks
    for it; the production gate is q_fuzzy_name_groups (same semantics
    reduced to the (brand, name_a, name_b) grain with a pair COUNT).
    Ground-truth tier now: quadratic-guarded on the input row count
    (raises above 100k rows like ngram_jaccard), bench-excluded by name
    at sf1/sf10."""
    from pleiades_spark.operators.dedup import _guard_quadratic
    from pleiades_spark.operators.editdist import edit_distance_pairs

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    _guard_quadratic(part, "fuzzy_name_pairs (row-expanded grain)", False)
    vocab = part.select("p_name").distinct().withColumn("g", F.lit(1))
    vp = edit_distance_pairs(vocab, "p_name", "p_name", "g", FUZZY_MAX_DIST)
    # direct both ways + identical-name self pairs: row-pair order is by
    # partkey, which is independent of the name ordering inside vp
    directed = (
        vp.select(F.col("text_a").alias("name_a"),
                  F.col("text_b").alias("name_b"), "dist")
        .unionAll(vp.select(F.col("text_b").alias("name_a"),
                            F.col("text_a").alias("name_b"), "dist"))
        .unionAll(vocab.select(F.col("p_name").alias("name_a"),
                               F.col("p_name").alias("name_b"),
                               F.lit(0).alias("dist")))
    )
    a = part.select(F.col("p_partkey").alias("part_a"),
                    F.col("p_brand").alias("brand"),
                    F.col("p_name").alias("name_a"))
    b = part.select(F.col("p_partkey").alias("part_b"),
                    F.col("p_brand").alias("b_brand"),
                    F.col("p_name").alias("b_name"))
    return (
        a.join(F.broadcast(directed), "name_a")
        .join(
            b,
            (F.col("brand") == F.col("b_brand"))
            & (F.col("name_b") == F.col("b_name"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .select("brand", "part_a", "part_b", "name_a", "name_b", "dist")
    )


ORACLE_FUZZY_NAME_PAIRS = f"""
SELECT a.p_brand AS brand, a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
 AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


def q_fuzzy_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION fuzzy-match grain (round-9 verdict #2): qualifying
    row-pair volume per (brand, name_a, name_b) instead of the pairs
    themselves. Everything a dedup/MDM decision needs — which name
    variants collide, how close, how many records are involved — at a
    |brands| × |vocab-pairs| output size that is INDEPENDENT of row
    count; q_fuzzy_name_pairs (the 2.3 B-row enumeration at sf10) is the
    quadratic-guarded ground truth this replaces in the sweeps.

    Scale shape: one groupBy reduces rows to (brand, name) groups with
    counts; Levenshtein runs once per DISTINCT name pair through the
    PassJoin segment-signature equi-join (operators/editdist.py, never
    all-pairs); the vocab-pair map broadcasts onto the reduced group
    grain. No stage touches row volume after the first aggregation.

    Grain contract: unordered name pairs canonicalized name_a < name_b
    (PassJoin's id order IS name order here — ids are the names);
    same-name groups contribute (name, name, 0, C(cnt,2)) — the
    self-pair count — computed with integer `div` on both engines (the
    product is even; no double round-trip)."""
    from pleiades_spark.operators.editdist import edit_distance_pairs

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    groups = (
        part.groupBy("p_brand", "p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    vocab = groups.select("p_name").distinct().withColumn("g", F.lit(1))
    vp = edit_distance_pairs(vocab, "p_name", "p_name", "g", FUZZY_MAX_DIST)
    ga = groups.select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
    )
    gb = groups.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_name").alias("b_name"),
        F.col("cnt").alias("cnt_b"),
    )
    cross = (
        ga.join(
            F.broadcast(
                vp.select(
                    F.col("text_a").alias("name_a"),
                    F.col("text_b").alias("name_b"),
                    "dist",
                )
            ),
            "name_a",
        )
        .join(
            gb,
            (F.col("brand") == F.col("b_brand"))
            & (F.col("name_b") == F.col("b_name")),
        )
        .select(
            "brand",
            "name_a",
            "name_b",
            F.col("dist").cast("int").alias("dist"),
            (F.col("cnt_a") * F.col("cnt_b")).cast("bigint").alias("n_pairs"),
        )
    )
    same = groups.filter(F.col("cnt") >= 2).select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
        F.col("p_name").alias("name_b"),
        F.lit(0).alias("dist"),
        F.shiftright((F.col("cnt") * (F.col("cnt") - F.lit(1))).cast("bigint"), 1)
        .alias("n_pairs"),
    )
    return cross.unionAll(same)


ORACLE_FUZZY_NAME_GROUPS = f"""
WITH g AS (
  SELECT p_brand, p_name, count(*) AS cnt FROM part GROUP BY p_brand, p_name
)
SELECT a.p_brand AS brand, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
FROM g a JOIN g b ON a.p_brand = b.p_brand AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
UNION ALL
SELECT p_brand AS brand, p_name AS name_a, p_name AS name_b,
       0 AS dist, CAST((cnt * (cnt - 1)) // 2 AS BIGINT) AS n_pairs
FROM g WHERE cnt >= 2
"""


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy pair generation (brand-blocked
    Levenshtein, q_fuzzy_name_pairs) composed with iterative connected
    components (operators/graph.py) → one canonical entity id per part,
    plus cluster size — the dedup-to-golden-record shape of MDM pipelines.

    Scale: the row-pair edge set grows QUADRATICALLY in this fixture
    (4.8k pairs at sf0.01, 504k at sf0.1, ~50M at sf1 — names repeat
    heavily), so iterating connected components over row pairs is
    edge-bound busywork: connectivity is decided entirely by
    (brand, name), never by the row. The graph therefore shrinks to one
    node per DISTINCT (brand, name) — node id = min partkey in the group,
    so min-label CC yields exactly the row-level min-partkey cluster id —
    with vocab-pair edges from the PassJoin stage; rows join their
    group's cluster back at the end (output-bound, one hash join).
    Same-name groups with >= 2 rows are row-level self-pairs, so they
    qualify even when their name matches no other name — they enter as
    edgeless singleton clusters. CC then runs on <= |brands|x|vocab|
    nodes at ANY row scale (measured 61.7s -> ~4s at sf1 vs the
    row-level graph).
    """
    from pleiades_spark.operators.editdist import edit_distance_pairs
    from pleiades_spark.operators.graph import connected_components

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    groups = part.groupBy("p_brand", "p_name").agg(
        F.min("p_partkey").alias("gid"), F.count(F.lit(1)).alias("n_rows")
    ).cache()
    vocab = groups.select("p_name").distinct().withColumn("g", F.lit(1))
    vp = edit_distance_pairs(vocab, "p_name", "p_name", "g", FUZZY_MAX_DIST)
    ga = groups.select(F.col("p_brand").alias("brand"),
                       F.col("p_name").alias("name_a"),
                       F.col("gid").alias("gid_a"))
    gb = groups.select(F.col("p_brand").alias("b_brand"),
                       F.col("p_name").alias("b_name"),
                       F.col("gid").alias("gid_b"))
    edges = (
        ga.join(F.broadcast(vp.select(F.col("text_a").alias("name_a"),
                                      F.col("text_b").alias("name_b"))), "name_a")
        .join(gb, (F.col("brand") == F.col("b_brand"))
              & (F.col("name_b") == F.col("b_name")))
        .select(F.col("gid_a").alias("doc_a"), F.col("gid_b").alias("doc_b"))
    )
    cc = connected_components(edges)
    # edgeless same-name groups with >= 2 rows: their own cluster
    singles = (
        groups.filter(F.col("n_rows") >= 2)
        .join(cc, groups.gid == cc.doc_id, "left_anti")
        .select(F.col("gid").alias("doc_id"), F.col("gid").alias("cluster"))
    )
    clusters = cc.unionAll(singles)
    sized = (
        clusters.join(groups, clusters.doc_id == groups.gid)
        .groupBy("cluster")
        .agg(F.sum("n_rows").alias("n_members"))
    )
    return (
        part.join(groups, ["p_brand", "p_name"])
        .join(clusters, F.col("gid") == F.col("doc_id"))
        .join(F.broadcast(sized), "cluster")
        .select(
            "p_partkey",
            F.col("cluster").alias("entity_id"),
            F.col("n_members").cast("long").alias("cluster_size"),
        )
    )


# reachability closure over the fuzzy pairs; every paired node (rep
# included) gets a row, so the window count IS the member count
ORACLE_ENTITY_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
   AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
), edges AS (
  SELECT part_a AS u, part_b AS v FROM pairs
  UNION SELECT part_b, part_a FROM pairs
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
), cc AS (
  SELECT node AS p_partkey, CAST(min(r) AS BIGINT) AS entity_id
  FROM reach GROUP BY node
)
SELECT p_partkey, entity_id,
       CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS cluster_size
FROM cc
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for a part type,
    per order year — conditional-over-unconditional sum ratio after a
    6-table snowflake join.

    Shuffle budget (round-7 sf10 tightening): the AMERICA region filter
    reduces the customer side BEFORE the custkey join (the old shape
    shuffled every customer and filtered by region after five joins);
    part (type-filtered) broadcasts and prunes lineitem before the
    orderkey shuffle; supplier + both nation legs broadcast. The share
    is computed in the SAME aggregation pass (sum(when)/sum), never a
    self-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_am = (
        cust.join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    oc = orders.join(cust_am, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                100
                * F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(volume),
                4,
            ).alias("mkt_share_pct")
        )
    )


ORACLE_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(100 * sum(CASE WHEN sn.n_name = 'NATION_3'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
"""


def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers stock each
    (brand, type, size) bucket, excluding one brand, one type family, and
    'complaint' suppliers.

    Adapted: no partsupp table, so the part↔supplier relation is the
    DISTINCT (l_partkey, l_suppkey) pairs observed in lineitem, and the
    complaint exclusion (ps_comment LIKE '%Complaints%' in spec) becomes
    s_acctbal < 0. Excluded suppliers leave via a broadcast anti join
    BEFORE the distinct — the count-distinct shuffle then keys on
    (brand, type, size), low cardinality by construction."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").like("PROMO%"))
        & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    rel = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .distinct()
    )
    return (
        rel.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


ORACLE_PARTS_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 19, 29, 39, 49)
GROUP BY p_brand, p_type, p_size
"""


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized fraction of a part's
    flow — correlated 'more than half of the part's total' threshold,
    then a semi join back to the supplier dim.

    Adapted: no partsupp availqty, so the spec's ``availqty > 0.5 * sum
    shipped`` becomes 'shipped > 0.5 × the part's total 1997 volume'.
    Decorrelated the Spark-first way: ONE groupBy to (partkey, suppkey),
    then a window sum over partkey for the denominator. That costs two
    exchanges, but the first ships map-side-combined pairs (lineitem rows
    collapse to (part, supp) partials before the wire) and the second
    ships the final pairs — both tiny relative to the fact scan, which is
    itself pre-pruned by the broadcast semi join on the name-filtered
    part keys. Threshold math stays exact: l_quantity is integral-valued,
    0.5 is a power of two, so both engines compare identical doubles."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part_keys = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    per_ps = (
        li.join(F.broadcast(part_keys), "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    total = F.sum("supp_qty").over(W.partitionBy("l_partkey"))
    dominant = (
        per_ps.withColumn("part_qty", total)
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.round(F.col("s_acctbal"), 4).alias("acctbal"))
    )


ORACLE_DOMINANT_SUPPLIERS = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_partkey, l_suppkey
), dom AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM per_ps
  ) WHERE supp_qty > 0.5 * part_qty
)
SELECT s_suppkey, s_name, round(s_acctbal, 4) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2' AND s_suppkey IN (SELECT l_suppkey FROM dom)
"""


# --- z-order layout key (multi-column clustering) --------------------------


def q_zorder_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleave of (l_partkey, l_suppkey) low 16 bits —
    the clustering key operators/layout.zorder_write sorts the table by so
    parquet min-max stats prune scans filtered on EITHER column.

    The gate pins the bit-interleave arithmetic cross-engine (exact
    integer shifts, oracle-identical); the physical layout effect —
    per-file span shrink — is measured in tests/test_layout.py. Global
    top-k executes as TakeOrderedAndProject (per-partition partial top-k,
    no full sort shuffle).
    """
    li = _t(spark, sf_dir, "lineitem")
    z = zvalue(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            z.alias("zval"),
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(200)
    )


ORACLE_ZORDER_RANK = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {zvalue_sql('(l_partkey % 65536)', '(l_suppkey % 65536)')} AS zval
FROM lineitem
ORDER BY zval, l_orderkey, l_linenumber
LIMIT 200
"""


# --- key-skew diagnostics ---------------------------------------------------


def _skew_profile(t: DataFrame, key: str, label: str, top_n: int = 10) -> DataFrame:
    """One-row skew profile of `key` in `t`: the pre-join diagnostic that
    decides whether a 100 TB shuffle needs salting/AQE-skew handling
    BEFORE it runs. The per-key counts frame is referenced three times
    (moment stats, top-N share, hot-key census) in ONE plan, so AQE's
    ReuseExchange computes the fact groupBy once; everything downstream
    operates on the n_keys-row reduced grain. Top-N goes through
    orderBy+limit (TakeOrderedAndProject — no global window sort)."""
    counts = t.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(top_n)
        .agg(F.sum("cnt").alias("top_cnt"))
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys")
    hot = (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") > F.lit(10.0) * (F.col("n_rows").cast("double") / F.col("n_keys")))
        .agg(F.count(F.lit(1)).alias("n_hot"))
    )

    def q4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        stats.crossJoin(top)
        .crossJoin(hot)
        .select(
            F.lit(label).alias("key_name"),
            "n_rows",
            "n_keys",
            "max_cnt",
            q4(avg).alias("avg_cnt"),
            q4(F.col("p50")).alias("p50_cnt"),
            q4(F.col("p99")).alias("p99_cnt"),
            q4(F.col("max_cnt") / avg).alias("skew_ratio"),
            q4(F.col("top_cnt").cast("double") / F.col("n_rows")).alias("top10_share"),
            F.col("n_hot").alias("n_hot_10x"),
        )
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report over the join/agg keys the other queries
    actually shuffle on: per key, row/key counts, count percentiles,
    max/avg skew ratio, top-10-key share, and the number of keys >10×
    the mean. This is the observability half of operators/skew.py — the
    report that tells you WHICH keys need salted_count_sum /
    salted_equi_join (and what AQE skew thresholds to set) before a
    100 TB run, instead of discovering the straggler task in the UI.
    Cost: one map-combined groupBy per audited key (5 here); all
    derived metrics run on the reduced n_keys grain.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    # NOTE (r13, measured dead end): sharing one scan per table via
    # GROUPING SETS ((k1),(k2)) (Expand; grouping_id-keyed profiles,
    # typed tie-break columns preserving the per-key top-10 comparator)
    # was implemented, oracle-verified at 3 SFs, and REVERTED: paired
    # A/B 0.94/1.06/1.09 at sf0.1/sf1/sf10 — the Expand streams 2× rows
    # through the partial agg and the merged hash table (partkey+suppkey
    # groups in one task) costs more than the saved scan.
    parts = [
        _skew_profile(li, "l_partkey", "lineitem.l_partkey"),
        _skew_profile(li, "l_suppkey", "lineitem.l_suppkey"),
        _skew_profile(orders, "o_custkey", "orders.o_custkey"),
        _skew_profile(ev, "user_id", "events.user_id"),
        _skew_profile(ev, "event_type", "events.event_type"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _skew_oracle_cte(table: str, key: str, label: str) -> str:
    return f"""
SELECT * FROM (
  WITH c AS (SELECT {key} AS k, count(*) AS cnt FROM {table} GROUP BY 1),
  s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
               max(cnt) AS max_cnt,
               quantile_cont(cnt, 0.5) AS p50, quantile_cont(cnt, 0.99) AS p99
        FROM c),
  t AS (SELECT CAST(sum(cnt) AS BIGINT) AS top_cnt FROM
        (SELECT cnt FROM c ORDER BY cnt DESC, k ASC LIMIT 10)),
  h AS (SELECT count(*) AS n_hot FROM c, s
        WHERE cnt > 10.0 * (CAST(n_rows AS DOUBLE) / n_keys))
  SELECT '{label}' AS key_name, n_rows, n_keys, max_cnt,
         floor(CAST(n_rows AS DOUBLE) / n_keys * 10000 + 0.5) / 10000 AS avg_cnt,
         floor(p50 * 10000 + 0.5) / 10000 AS p50_cnt,
         floor(p99 * 10000 + 0.5) / 10000 AS p99_cnt,
         floor(max_cnt / (CAST(n_rows AS DOUBLE) / n_keys) * 10000 + 0.5) / 10000
           AS skew_ratio,
         floor(CAST(top_cnt AS DOUBLE) / n_rows * 10000 + 0.5) / 10000
           AS top10_share,
         n_hot AS n_hot_10x
  FROM s, t, h
)"""


ORACLE_SKEW_REPORT = " UNION ALL ".join(
    _skew_oracle_cte(t, k, f"{t}.{k}")
    for t, k in [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
        ("events", "event_type"),
    ]
)


def q_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report→knobs wiring as a standing gate (round-8 verdict #7):
    operators/skew.salting_plan over the five audited shuffle keys —
    per key: needs_salting, the pow2 salt factor that spreads the hot
    key to the p99 key's per-task load, and the AQE skew-join
    factor/threshold recommendations. Pure arithmetic on the report's
    reduced grain (5 rows), attached to the same job — the oracle
    replays every knob, so a formula regression (not just a crash)
    fails the hash. The pow2 choice is a when-chain over candidate
    powers, not pow/ceil/log2 — libm ULP drift at the pow2 boundaries
    would flip the ceil across engines (operators/skew.py rationale)."""
    from pleiades_spark.operators.skew import salting_plan

    return salting_plan(q_skew_report(spark, sf_dir), n_shuffle_partitions=32)


ORACLE_SALTING_PLAN = f"""
WITH rpt AS ({ORACLE_SKEW_REPORT}),
k AS (
  SELECT *,
         CAST(max_cnt AS DOUBLE) / GREATEST(p99_cnt, avg_cnt, 1.0) AS raw_s,
         skew_ratio > 4.0 AS needs_salting,
         CAST(max_cnt AS DOUBLE) * 32.0 / CAST(n_rows AS DOUBLE) AS part_ratio,
         CAST(n_rows AS DOUBLE) * 128.0 / 32.0 AS mpb
  FROM rpt
)
SELECT key_name, n_rows, n_keys, max_cnt, avg_cnt, p50_cnt, p99_cnt,
       skew_ratio, top10_share, n_hot_10x, needs_salting,
       CAST(CASE WHEN NOT needs_salting THEN 1
                 WHEN raw_s <= 2.0 THEN 2
                 WHEN raw_s <= 4.0 THEN 4
                 WHEN raw_s <= 8.0 THEN 8
                 WHEN raw_s <= 16.0 THEN 16
                 WHEN raw_s <= 32.0 THEN 32
                 ELSE 64 END AS INT) AS n_salts,
       CAST(GREATEST(2, LEAST(5, CAST(floor(part_ratio / 2.0) AS INT)))
            AS INT) AS aqe_skewed_partition_factor,
       CAST(GREATEST(16777216, LEAST(268435456,
                     CAST(floor(2.0 * mpb) AS BIGINT)))
            AS BIGINT) AS aqe_skewed_partition_threshold_bytes
FROM k
"""


# --- join-size estimation (hash key sample) ---------------------------------

JOIN_EST_RATE = 16


def _join_size_est(
    a: DataFrame, akey: str, b: DataFrame, bkey: str, label: str,
    rate: int = JOIN_EST_RATE,
) -> DataFrame:
    """Estimate |A ⋈ B on key| from a deterministic 1/rate hash sample
    of the KEY DOMAIN: |A⋈B| = Σ_k c_A(k)·c_B(k), and sampling keys by
    h32(k) mod rate = 0 gives an unbiased Horvitz-Thompson estimate
    rate·Σ_sampled c_A·c_B. Both sides filter BEFORE their groupBy, so
    the planning pass shuffles ~1/rate of each input — the point: know
    whether the shuffle output is 10⁹ or 10¹³ rows (and set AQE/salt
    accordingly) at a sixteenth of the cost of running the join."""
    from pleiades_spark.functions.hashing import h32

    def counts(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(F.col(key).cast("string").alias("k"))
            .filter(F.pmod(h32(F.col("k")), F.lit(rate)) == 0)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    ca = counts(a, akey)
    if a is b and akey == bkey:
        # SELF-join estimate (r13): both CTEs are the identical sampled
        # counts frame and every key matches itself, so |A⋈A| = Σ c²
        # directly — the r12 shape scanned + md5-hashed + shuffled the
        # same input twice and equi-joined the two copies. Same
        # integers (cnt·cnt_b with cb ≡ ca), half the scan/hash work,
        # no join exchange.
        agged = ca.agg(
            F.count(F.lit(1)).alias("n_sampled_keys"),
            (F.lit(rate) * F.sum(F.col("cnt") * F.col("cnt"))).alias(
                "est_rows"
            ),
        )
    else:
        cb = counts(b, bkey).withColumnRenamed("cnt", "cnt_b")
        agged = ca.join(cb, "k").agg(
            F.count(F.lit(1)).alias("n_sampled_keys"),
            (F.lit(rate) * F.sum(F.col("cnt") * F.col("cnt_b"))).alias(
                "est_rows"
            ),
        )
    return agged.select(
        F.lit(label).alias("join_name"),
        "n_sampled_keys",
        F.col("est_rows").cast("bigint").alias("est_rows"),
    )


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join cardinality estimates for the three join shapes
    the suite shuffles most: the FK join (lineitem⋈orders), the skewed
    self-join (lineitem⋈lineitem on partkey — the shape that explodes
    when a key is hot), and the behavioral self-join (events⋈events on
    user_id). Companion to skew_report: that query profiles one side's
    distribution; this one prices the OUTPUT of putting two sides
    together, from a 1/16 key-domain sample."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    parts = [
        _join_size_est(li, "l_orderkey", orders, "o_orderkey",
                       "lineitem*orders@orderkey"),
        _join_size_est(li, "l_partkey", li, "l_partkey",
                       "lineitem*lineitem@partkey"),
        _join_size_est(ev, "user_id", ev, "user_id",
                       "events*events@user_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _join_est_oracle(ta: str, ka: str, tb: str, kb: str, label: str) -> str:
    def cte(t: str, k: str) -> str:
        return (
            f"SELECT k, count(*) AS cnt FROM "
            f"(SELECT CAST({k} AS VARCHAR) AS k FROM {t}) "
            f"WHERE {h32_sql('k')} % {JOIN_EST_RATE} = 0 GROUP BY k"
        )

    return f"""
SELECT '{label}' AS join_name,
       CAST(count(*) AS BIGINT) AS n_sampled_keys,
       CAST({JOIN_EST_RATE} * sum(ca.cnt * cb.cnt) AS BIGINT) AS est_rows
FROM ({cte(ta, ka)}) ca JOIN ({cte(tb, kb)}) cb USING (k)"""


ORACLE_JOIN_SIZE_ESTIMATE = " UNION ALL ".join([
    _join_est_oracle("lineitem", "l_orderkey", "orders", "o_orderkey",
                     "lineitem*orders@orderkey"),
    _join_est_oracle("lineitem", "l_partkey", "lineitem", "l_partkey",
                     "lineitem*lineitem@partkey"),
    _join_est_oracle("events", "user_id", "events", "user_id",
                     "events*events@user_id"),
])


# --- data-quality layer: table profile + referential integrity -------------

# (column, kind) — kind drives which stats apply. ts profiles on its
# epoch-seconds image so min/max share the numeric column.
_PROFILE_COLS = (
    ("event_id", "num"), ("ts", "ts"), ("user_id", "num"),
    ("event_type", "str"), ("value", "num"), ("props", "str"),
)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the events table: row count,
    null count, exact distinct count, numeric min/max — the first query
    any pipeline runs against a new table drop, and the input to the
    freshness/drift monitors (psi_drift consumes these grains).

    ONE aggregate row computes everything (Spark plans the multi-
    distinct via a single Expand pass, map-side partialed), then
    explodes to a row per column. Exact count(DISTINCT) is the oracle-
    checkable gate form; at 100 TB swap approx_count_distinct — one
    pass, no Expand — and keep everything else (documented production
    twin, same pattern as bloom_semi_prune_prod).
    """
    ev = _t(spark, sf_dir, "events")

    def num_img(c: str, kind: str):
        if kind == "ts":
            return F.unix_timestamp(c).cast("double")
        if kind == "num":
            return F.col(c).cast("double")
        return F.lit(None).cast("double")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(num_img(c, kind)).alias(f"mn_{c}"),
            F.max(num_img(c, kind)).alias(f"mx_{c}"),
        ]
    one = ev.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.round(F.col(f"mn_{c}"), 4).alias("min_num"),
            F.round(F.col(f"mx_{c}"), 4).alias("max_num"),
        )
        for c, _ in _PROFILE_COLS
    ])
    return one.select(F.inline(rows))


def _profile_oracle() -> str:
    aggs, outs = ["CAST(count(*) AS BIGINT) AS n_rows"], []
    for c, kind in _PROFILE_COLS:
        img = {"ts": f"CAST(floor(epoch({c})) AS DOUBLE)",
               "num": f"CAST({c} AS DOUBLE)",
               "str": "CAST(NULL AS DOUBLE)"}[kind]
        aggs += [
            f"CAST(count({c}) AS BIGINT) AS nn_{c}",
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}",
            f"min({img}) AS mn_{c}", f"max({img}) AS mx_{c}",
        ]
        outs.append(
            f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_null,"
            f" nd_{c} AS n_distinct, round(mn_{c}, 4) AS min_num,"
            f" round(mx_{c}, 4) AS max_num FROM one"
        )
    return ("WITH one AS (SELECT " + ", ".join(aggs) + " FROM events)\n"
            + "\nUNION ALL\n".join(outs))


ORACLE_TABLE_PROFILE = _profile_oracle()

# (label, child table, child key, parent table, parent key)
_FK_RELATIONS = (
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
)


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the star schema: per foreign-key
    edge, child row count and orphan count (child keys with no parent),
    via LEFT ANTI join. The lakehouse has no FK enforcement — this is
    the scheduled audit that replaces it, and a 0-orphan result is the
    precondition for the broadcast-dim join strategy every TPC-H-shape
    query here assumes.

    Scale: each anti join is an equi-join on the key — dims broadcast
    (AQE decides at runtime; no hint needed since a CORRECT audit must
    also handle a 10⁹-row parent), the lineitem→orders edge shuffles
    both facts on orderkey exactly like the Q3/Q9 plans (bucketed
    tables skip it). Orphan counting is count-only: no payload columns
    survive the scan, so ReadSchema is the key column alone.
    """
    parts = []
    # NOTE (r13, measured dead end): folding both counts into ONE left
    # OUTER join pass (count(*) + count of hit-IS-NULL; count-preserving
    # since parent keys are PKs) removed the second child scan but
    # regressed 1.26× at sf10 in the paired A/B — the outer join streams
    # every matched child row through the probe+agg, where left_anti
    # short-circuits matches and the count-only scan is cheap. Keep the
    # anti-join form.
    for label, child, ckey, parent, pkey in _FK_RELATIONS:
        c = _t(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pkey).alias("k"))
        orphans = c.join(p, "k", "left_anti")
        parts.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(
                F.lit(label).alias("relation"), "n_child", "n_orphans",
                F.floor(F.col("n_orphans") / F.col("n_child") * 10000 + 0.5)
                .cast("double").alias("orphan_bp"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


ORACLE_FK_INTEGRITY = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS relation,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
       (SELECT CAST(count(*) AS BIGINT) FROM {child} c
         LEFT JOIN {parent} p ON c.{ckey} = p.{pkey}
        WHERE p.{pkey} IS NULL) AS n_orphans,
       floor((SELECT count(*) FROM {child} c
               LEFT JOIN {parent} p ON c.{ckey} = p.{pkey}
              WHERE p.{pkey} IS NULL)
             / (SELECT count(*) FROM {child}) * 10000 + 0.5) AS orphan_bp"""
    for label, child, ckey, parent, pkey in _FK_RELATIONS
)


QUERIES = [
    Query("pricing_summary", q_pricing_summary, ORACLE_PRICING_SUMMARY,
          "TPC-H Q1: wide hash agg with pushdown filter"),
    Query("shipping_priority", q_shipping_priority, ORACLE_SHIPPING_PRIORITY,
          "TPC-H Q3: 3-way join + agg + deterministic top-k"),
    Query("local_supplier_volume", q_local_supplier_volume, ORACLE_LOCAL_SUPPLIER_VOLUME,
          "TPC-H Q5: snowflake join chain, broadcast dims"),
    Query("customers_without_orders", q_customers_without_orders,
          ORACLE_CUSTOMERS_WITHOUT_ORDERS, "anti join (NOT EXISTS)"),
    Query("nations_with_big_orders", q_nations_with_big_orders,
          ORACLE_NATIONS_WITH_BIG_ORDERS, "semi join (EXISTS) + lookup + agg"),
    Query("order_fill_rate", q_order_fill_rate, ORACLE_ORDER_FILL_RATE,
          "TPC-H Q13: left outer join + null-aware double agg"),
    Query("segment_set_ops", q_segment_set_ops, ORACLE_SEGMENT_SET_OPS,
          "UNION ALL / INTERSECT / EXCEPT"),
    Query("customer_running_total", q_customer_running_total,
          ORACLE_CUSTOMER_RUNNING_TOTAL, "window frame running sum + lag + row_number"),
    Query("top_parts_per_brand", q_top_parts_per_brand, ORACLE_TOP_PARTS_PER_BRAND,
          "partitioned top-k via row_number"),
    Query("order_priority_rollup", q_order_priority_rollup,
          ORACLE_ORDER_PRIORITY_ROLLUP, "ROLLUP multi-grain agg"),
    Query("lineitem_cube", q_lineitem_cube, ORACLE_LINEITEM_CUBE,
          "CUBE over (returnflag, linestatus) with grouping_id, one Expand pass"),
    Query("status_pivot", q_status_pivot, ORACLE_STATUS_PIVOT,
          "pivot ≡ conditional aggregation"),
    Query("scalar_functions", q_scalar_functions, ORACLE_SCALAR_FUNCTIONS,
          "string/date/math scalar breadth"),
    Query("distinct_counts", q_distinct_counts, ORACLE_DISTINCT_COUNTS,
          "exact multi-column count distinct"),
    Query("skew_report", q_skew_report, ORACLE_SKEW_REPORT,
          "shuffle-key skew diagnostics: count percentiles, max/avg ratio, "
          "top-10 share, hot-key census per join/agg key"),
    Query("salting_plan", q_salting_plan, ORACLE_SALTING_PLAN,
          "skew report wired to the fixes: per-key salt factor + AQE "
          "skew-join knob recommendations, every formula oracle-replayed"),
    Query("join_size_estimate", q_join_size_estimate,
          ORACLE_JOIN_SIZE_ESTIMATE,
          "pre-flight join output cardinality from a 1/16 hash sample "
          "of the key domain (Horvitz-Thompson over sampled keys)"),
    Query("approx_distinct", q_approx_distinct, None,
          "HyperLogLog++ approx distinct (rows-only; sketch differs per engine)"),
    Query("price_percentiles", q_price_percentiles, ORACLE_PRICE_PERCENTILES,
          "exact interpolated percentiles"),
    Query("above_avg_lineitems", q_above_avg_lineitems, ORACLE_ABOVE_AVG_LINEITEMS,
          "correlated-subquery shape, decorrelated join form"),
    Query("priority_shipmode", q_priority_shipmode, ORACLE_PRIORITY_SHIPMODE,
          "TPC-H Q12: conditional sums in one pass"),
    Query("order_priority_check", q_order_priority_check, ORACLE_ORDER_PRIORITY_CHECK,
          "TPC-H Q4: correlated EXISTS as semi join with join-condition predicate"),
    Query("nation_volume_shipping", q_nation_volume_shipping,
          ORACLE_NATION_VOLUME_SHIPPING,
          "TPC-H Q7: bi-nation join chain, expression grouping key"),
    Query("stats_aggregates", q_stats_aggregates, ORACLE_STATS_AGGREGATES,
          "stddev/variance/corr/covar distributed moments"),
    Query("status_unpivot", q_status_unpivot, ORACLE_STATUS_UNPIVOT,
          "unpivot (melt) wide → long"),
    Query("cheapest_part_per_brand", q_cheapest_part_per_brand,
          ORACLE_CHEAPEST_PART_PER_BRAND,
          "TPC-H Q2: correlated MIN subquery, decorrelated join form"),
    Query("forecast_revenue", q_forecast_revenue, ORACLE_FORECAST_REVENUE,
          "TPC-H Q6: scan-filter-agg, all predicates pushed"),
    Query("product_type_profit", q_product_type_profit, ORACLE_PRODUCT_TYPE_PROFIT,
          "TPC-H Q9 shape: 5-way join, profit per nation-year"),
    Query("returned_item_revenue", q_returned_item_revenue,
          ORACLE_RETURNED_ITEM_REVENUE,
          "TPC-H Q10: returns revenue per customer, deterministic top-20"),
    Query("important_parts", q_important_parts, ORACLE_IMPORTANT_PARTS,
          "TPC-H Q11 shape: fraction-of-global-total filter (scalar subquery)"),
    Query("promo_revenue", q_promo_revenue, ORACLE_PROMO_REVENUE,
          "TPC-H Q14: conditional/unconditional ratio in one pass"),
    Query("top_supplier", q_top_supplier, ORACLE_TOP_SUPPLIER,
          "TPC-H Q15: join against own aggregate's max"),
    Query("small_qty_revenue", q_small_qty_revenue, ORACLE_SMALL_QTY_REVENUE,
          "TPC-H Q17: correlated avg decorrelated into per-part agg join"),
    Query("large_volume_customers", q_large_volume_customers,
          ORACLE_LARGE_VOLUME_CUSTOMERS,
          "TPC-H Q18: HAVING on fact agg + enrichment joins"),
    Query("disjunctive_revenue", q_disjunctive_revenue, ORACLE_DISJUNCTIVE_REVENUE,
          "TPC-H Q19 shape: OR-of-ANDs predicate, CNF extraction"),
    Query("waiting_suppliers", q_waiting_suppliers, ORACLE_WAITING_SUPPLIERS,
          "TPC-H Q21 shape: latest-shipper on multi-supplier orders, top-10"),
    Query("sales_opportunity", q_sales_opportunity, ORACLE_SALES_OPPORTUNITY,
          "TPC-H Q22 shape: scalar-avg filter + anti join + nation rollup"),
    Query("heavy_hitters_cms", q_heavy_hitters_cms, ORACLE_HEAVY_HITTERS_CMS,
          "Count-Min Sketch top-20 frequency estimation (replayed error)"),
    Query("bloom_semi_prune", q_bloom_semi_prune, ORACLE_BLOOM_SEMI_PRUNE,
          "Bloom-filter join pruning with deterministic false-positive count"),
    Query("bloom_semi_prune_prod", q_bloom_semi_prune_prod,
          ORACLE_BLOOM_SEMI_PRUNE_PROD,
          "production xxhash64 Bloom prune + exact verify (hash-family-"
          "independent final aggregate, full value gate)"),
    Query("market_share", q_market_share, ORACLE_MARKET_SHARE,
          "TPC-H Q8: nation share of regional market per year, 6-table snowflake"),
    Query("parts_supplier_counts", q_parts_supplier_counts,
          ORACLE_PARTS_SUPPLIER_COUNTS,
          "TPC-H Q16 shape: distinct-supplier counts with anti-join exclusion"),
    Query("dominant_suppliers", q_dominant_suppliers, ORACLE_DOMINANT_SUPPLIERS,
          "TPC-H Q20 shape: correlated fraction-of-part threshold + semi join"),
    Query("grouped_sampled_quantiles", q_grouped_sampled_quantiles,
          ORACLE_GROUPED_SAMPLED_QUANTILES,
          "per-key bottom-k hash-sample quantiles (fixed summary per group)"),
    Query("sampled_percentiles", q_sampled_percentiles,
          ORACLE_SAMPLED_PERCENTILES,
          "bottom-k hash-sample quantiles (deterministic approximate percentiles)"),
    Query("higher_moments", q_higher_moments, ORACLE_HIGHER_MOMENTS,
          "skewness/kurtosis from explicit power sums (engine-agnostic formula)"),
    Query("weighted_median", q_weighted_median, ORACLE_WEIGHTED_MEDIAN,
          "exact weighted median via integer cumulative-weight window"),
    Query("window_function_breadth", q_window_function_breadth,
          ORACLE_WINDOW_FUNCTION_BREADTH,
          "rank/dense_rank/percent_rank/cume_dist/ntile/lead/lag/nth_value, one pass"),
    Query("salted_supplier_join", q_salted_supplier_join,
          ORACLE_SALTED_SUPPLIER_JOIN,
          "skew-spread salted equi-join, plain-join oracle (invariance proof)"),
    Query("fuzzy_name_groups", q_fuzzy_name_groups, ORACLE_FUZZY_NAME_GROUPS,
          "fuzzy match at the grouped grain: name-pair + row-pair count"),
    Query("fuzzy_name_pairs", q_fuzzy_name_pairs, ORACLE_FUZZY_NAME_PAIRS,
          "brand-blocked Levenshtein fuzzy join (entity resolution)"),
    Query("zorder_rank", q_zorder_rank, ORACLE_ZORDER_RANK,
          "Morton Z-order clustering key (bit interleave, scan-pruning layout)"),
    Query("entity_clusters", q_entity_clusters, ORACLE_ENTITY_CLUSTERS,
          "fuzzy pairs -> connected components -> canonical entity ids"),
    Query("table_profile", q_table_profile, ORACLE_TABLE_PROFILE,
          "per-column profile: nulls, exact distinct, numeric min/max"),
    Query("fk_integrity", q_fk_integrity, ORACLE_FK_INTEGRITY,
          "referential-integrity audit: orphan counts per FK edge"),
]
