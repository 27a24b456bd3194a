"""Driver-facing query registry: name → (PySpark builder, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 has an entry here; ``__spark_entry__``
re-exports the registry. Conventions that keep the driver's hash-compare
stable (order-insensitive value hash over columns sorted by name):

- Every computed column is aliased IDENTICALLY in the Spark builder and the
  oracle SQL.
- Double aggregates go through exact DECIMAL(18,4) arithmetic and are cast
  to DOUBLE once at the end (see functions/numeric.py) — floating sums are
  order-dependent and Spark's shuffle order is not DuckDB's scan order.
- Integer-ish outputs are pinned: years → INT, counts/sums of ints → BIGINT
  (DuckDB SUM(int) is HUGEINT; the oracle casts it down).
- LIMIT queries always order by a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import catalog
from .functions.numeric import davg, dec, dec_factor, dsum, pct_rate
from .operators import marts, relational


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(fn, oracle, tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A. Reference surface (SURVEY.md §2.1-§2.3) over the fixture star schema.
# ---------------------------------------------------------------------------


@register(
    "fct_orders_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)                          AS year,
           COUNT(*)                                                AS launches,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS successes,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS failures,
           ROUND(100.0 * CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 / NULLIF(COUNT(*), 0), 2)                          AS success_rate_pct
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("reference", "mart", "A1-A6"),
)
def fct_orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference mart (fct_spacex_launches_by_year.sql:3-11) transplanted
    onto the orders fact: success := o_orderstatus = 'F'."""
    return marts.by_period_conditional_rollup(
        _t(spark, sf_dir, "orders"), "o_orderdate", F.col("o_orderstatus") == "F"
    )


@register(
    "fct_events_by_day",
    oracle="""
    SELECT CAST(ts AS DATE)                                        AS day,
           COUNT(*)                                                AS launches,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS successes,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS failures,
           ROUND(100.0 * CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 / NULLIF(COUNT(*), 0), 2)                          AS success_rate_pct
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("reference", "mart"),
)
def fct_events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same conditional-rate mart at daily grain over the events stream table
    (success := purchase) — the shape a by-year mart takes on 1-month data."""
    ev = _t(spark, sf_dir, "events")
    success = F.col("event_type") == "purchase"
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(*marts.conditional_counts(success))
        .withColumn("success_rate_pct", pct_rate(F.col("successes"), F.col("launches")))
        .orderBy("day")
    )


@register(
    "stg_events_typed",
    oracle="""
    SELECT event_id,
           ts,
           CAST(year(ts) AS INT)                                   AS year,
           event_type,
           value,
           CAST(json_extract_string(props, '$.k') AS BIGINT)       AS prop_k
    FROM events
    """,
    tags=("reference", "staging", "P1-P8", "S2"),
)
def stg_events_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging-view shape (stg_spacex_launches.sql:3-24): projection, derived
    year (P7), and JSON decode of the props payload (S2) — the reference's
    ``pd.json_normalize`` as a declarative ``get_json_object``."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        F.year("ts").cast("int").alias("year"),
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "raw_count_orders",
    oracle="SELECT COUNT(*) AS n FROM orders",
    tags=("reference", "adhoc"),
)
def raw_count_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:87 — ``select count(*) from raw.spacex_launches``."""
    return _t(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n"))


@register(
    "top_years_desc",
    oracle="""
    WITH fct AS (
      SELECT CAST(year(o_orderdate) AS INT) AS year, COUNT(*) AS launches
      FROM orders GROUP BY 1)
    SELECT year, launches FROM fct ORDER BY year DESC LIMIT 5
    """,
    tags=("reference", "adhoc", "topk"),
)
def top_years_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:102 — mart ordered year desc with LIMIT; fuses to
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    fct = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("year"))
        .agg(F.count(F.lit(1)).alias("launches"))
    )
    return relational.topk(fct, [F.col("year").desc()], 5)


# ---------------------------------------------------------------------------
# B. General relational surface (SURVEY.md §7 step 4).
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)       AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)  AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → 8-aggregate hash agg. The filter and
    the 7-column projection push into the parquet scan; partial aggregation
    runs map-side so the shuffle carries ≤ (flags × partials)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    charge = disc_price * dec_factor(1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_unshipped_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dims broadcast into the fact join, then
    top-k. customer is small → broadcast; orders⋈lineitem co-partitions on
    the order key (sort-merge at scale, AQE may pick shuffled-hash)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(dec("l_extendedprice") * dec_factor(1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    return relational.topk(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")],
        10,
    )


@register(
    "q5_nation_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey  = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "broadcast", "tpch"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: a 5-way star join. region/nation/customer are
    dimensions → explicit broadcast; only orders⋈lineitem shuffles. At
    100 TB this is the canonical 'broadcast the dims, shuffle the facts
    once' plan."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join — right side collapses to distinct keys,
    left rows never duplicate (SURVEY.md §2.4: joins absent in reference)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return relational.semi_join(
        c, o, c.c_custkey == o.o_custkey
    ).select("c_custkey", "c_name")


@register(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return relational.anti_join(
        c, o, c.c_custkey == o.o_custkey
    ).select("c_custkey", "c_name")


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — rows-frame window. One shuffle on
    o_custkey; frame evaluation is sequential per key (deterministic order
    via the o_orderkey tiebreaker)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n via row_number — the distributed alternative to a
    driver-side loop; AQE splits skewed customers."""
    o = _t(spark, sf_dir, "orders")
    out = relational.ranked_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))


@register(
    "setop_union_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    UNION
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop",),
)
def setop_union_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dropDuplicates; map-side partial distinct."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.union(b).distinct()


@register(
    "setop_intersect_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop",),
)
def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop",),
)
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT (exceptAll would keep surplus dups)


@register(
    "distinct_status_priority",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("distinct",),
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets; gid disambiguates subtotal rows from genuine
    NULL keys (none here, but the contract matters)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — the inferring variant costs an
    extra full scan just to learn the domain. Absent combos coalesce to 0
    to match conditional-aggregation semantics."""
    out = relational.pivot_counts(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus", ["O", "F", "P"]
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(f"`{s}`"), F.lit(0)).alias(s) for s in ("O", "F", "P")],
    )


@register(
    "scalar_functions_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                               AS name_upper,
           CAST(LENGTH(p_name) AS INT)                 AS name_len,
           SUBSTR(p_name, 1, 5)                        AS name_pfx,
           CONCAT_WS('-', p_brand, p_type)             AS brand_type,
           CAST(ABS(p_size - 25) AS INT)               AS size_dist,
           CAST(p_size % 7 AS INT)                     AS size_mod,
           ROUND(p_retailprice * 1.1, 2)               AS price_bumped
    FROM part
    """,
    tags=("scalar",),
)
def scalar_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library surface (reference uses only casts/round/
    date_part — SURVEY.md §2.4): string, math, conditional expressions, all
    JVM-side built-ins inside one codegen stage."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_bumped"),
    )


@register(
    "scalar_dates_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS y,
           CAST(month(o_orderdate) AS INT)   AS m,
           CAST(day(o_orderdate) AS INT)     AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE)         AS odate
    FROM orders
    """,
    tags=("scalar", "dates"),
)
def scalar_dates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("odate"),
    )


@register(
    "filter_pushdown_lineitem",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("filter", "scan"),
)
def filter_pushdown_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + narrow projection: both reach the parquet reader
    (PushedFilters + 5-column ReadSchema) — at 100 TB this is the difference
    between scanning 100 TB and scanning row-group-pruned slices."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 5)
        & (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


@register(
    "count_distinct_customers_by_status",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "distinct"),
)
def count_distinct_customers_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "median_quantity_by_flag",
    oracle="""
    SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (SQL percentile_cont semantics on both
    engines). The approximate variant for 100 TB is
    ``approx_quantiles_lineitem`` (no oracle — sketch-based)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"))
    )


@register("approx_distinct_parts", oracle=None, tags=("agg", "approx", "no-oracle"))
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count — the 100 TB-posture variant of
    COUNT(DISTINCT): no exact-distinct shuffle, fixed-size sketch per
    partition. No oracle (sketch estimates are engine-specific);
    driver records the rows-only check."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register("approx_quantiles_lineitem", oracle=None, tags=("agg", "approx", "no-oracle"))
def approx_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch): mergeable across 1000
    executors, bounded memory — the scale path for quantiles."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("approx_median"),
            F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("approx_p95"),
        )
    )
