"""Driver-contract query registry.

Each entry pairs an idiomatic-Spark DataFrame builder (spark, sf_dir) ->
DataFrame with an equivalent DuckDB oracle SQL string over the same parquet
tables. Column names/aliases are IDENTICAL on both sides (driver hashes
values after sorting columns by name).

Queries exercise the SURVEY §2 operator inventory on the testdata star
schema (mapping in FIXTURES.md §B), plus the LLM-data-pipeline extensions
(dedup / similarity / text analysis) on `documents` / `embeddings`.

Float discipline: aggregates over DOUBLE are rounded on BOTH sides so
summation-order differences between Spark and DuckDB can't flip the value
hash; sums here are ~1e6-1e9 with ~1e-7 absolute float error, so round(2-4)
is safely inside the noise floor.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.analytics import (
    derive_year_quarter,
    pivot_by_period,
    top_k,
    top_k_per_group,
)
from .operators.conform import broadcast_lookup, left_join, union_conform
from .sources.files import read_testdata


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> non-SQL-expressible, driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.5): TPC-H Q1-style pricing summary.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="groupBy().agg() surface: sum/avg/count with map-side partial aggregation.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# J1: left outer equi-join, single key (institutions <- financials analog).
# ---------------------------------------------------------------------------
@register(
    "q02_customer_order_totals",
    """
    SELECT c_mktsegment,
           count(o_orderkey)                     AS order_count,
           round(sum(coalesce(o_totalprice,0)), 2) AS segment_revenue,
           count(DISTINCT c_custkey)             AS customer_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    doc="J1 left join (1:N fan-out) + grouped agg; AQE picks broadcast if small.",
)
def q02_customer_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    joined = left_join(cust, orders.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count("o_orderkey").alias("order_count"),
        F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
            "segment_revenue"
        ),
        F.countDistinct("c_custkey").alias("customer_count"),
    )


# ---------------------------------------------------------------------------
# J4: broadcast dimension lookup chain (state-dict analog: nation/region).
# ---------------------------------------------------------------------------
@register(
    "q03_revenue_by_region",
    """
    SELECT r_name AS region_name,
           round(sum(o_totalprice), 2) AS region_revenue,
           count(*) AS order_count
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="J4 broadcast dim joins (nation/region are tiny) -- no Python UDF hop.",
)
def q03_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    dim = broadcast_lookup(
        nation, region, key="n_regionkey", dim_key="r_regionkey", value="r_name", out="region_name"
    ).select("n_nationkey", "region_name")
    enriched = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
    )
    return enriched.groupBy("region_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("region_revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


# ---------------------------------------------------------------------------
# F7-F9 date derivations: year/quarter fact columns (gold fact analog).
# ---------------------------------------------------------------------------
@register(
    "q04_revenue_by_year_quarter",
    """
    SELECT year(o_orderdate)    AS year,
           quarter(o_orderdate) AS quarter,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS order_count
    FROM orders
    GROUP BY 1, 2
    """,
    doc="F.year/F.quarter derivation (fixes reference's bitwise quarter-map bug, SURVEY §4.3#5).",
)
def q04_revenue_by_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = derive_year_quarter(t(spark, sf_dir, "orders"), "o_orderdate")
    return orders.groupBy("year", "quarter").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


# ---------------------------------------------------------------------------
# A4/J3 rewrite: quarter pivot as single groupBy().pivot() (vs the
# reference's O(Q) full-join loop, goldLayer/BuildGoldLayer.py:92-139).
# ---------------------------------------------------------------------------
@register(
    "q05_quarterly_revenue_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN quarter(l_shipdate)=1 THEN l_extendedprice END), 2) AS q1_revenue,
           round(sum(CASE WHEN quarter(l_shipdate)=2 THEN l_extendedprice END), 2) AS q2_revenue,
           round(sum(CASE WHEN quarter(l_shipdate)=3 THEN l_extendedprice END), 2) AS q3_revenue,
           round(sum(CASE WHEN quarter(l_shipdate)=4 THEN l_extendedprice END), 2) AS q4_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="single-shuffle pivot with explicit values (no distinct-collect pre-pass).",
)
def q05_quarterly_revenue_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").withColumn("qtr", F.quarter("l_shipdate"))
    pv = pivot_by_period(
        li,
        keys=["l_returnflag"],
        period_col="qtr",
        measure=F.round(F.sum("l_extendedprice"), 2),
        values=[1, 2, 3, 4],
    )
    renames = {str(q): f"q{q}_revenue" for q in (1, 2, 3, 4)}
    return pv.withColumnsRenamed(renames)


# ---------------------------------------------------------------------------
# O2 + top-k: TakeOrderedAndProject, no global sort shuffle.
# ---------------------------------------------------------------------------
@register(
    "q06_top_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="global top-k via orderBy+limit (TakeOrderedAndProject); orderkey tiebreak for determinism.",
)
def q06_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return top_k(
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "o_orderstatus",
        ),
        25,
        [F.desc("total_price"), F.asc("o_orderkey")],
    )


# ---------------------------------------------------------------------------
# U1 + A1: union-by-name + distinct (silver_data analog).
# ---------------------------------------------------------------------------
@register(
    "q07_union_distinct_status",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM (
      SELECT DISTINCT o_orderkey, o_orderstatus FROM (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
      )
    )
    GROUP BY o_orderstatus
    """,
    doc="unionByName (column order differs between branches) + keyed distinct.",
)
def q07_union_distinct_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    f_side = orders.filter("o_orderstatus = 'F'")
    # swap column order on one branch: unionByName must align by name (U1)
    rest = orders.filter("o_orderstatus <> 'F'").select("o_orderstatus", "o_orderkey")
    unioned = union_conform([f_side, rest, f_side])
    return unioned.distinct().groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# P5/F2-F4: filter + case normalization (vss_* motif analog).
# ---------------------------------------------------------------------------
@register(
    "q08_normalized_directory",
    """
    SELECT c_custkey AS customer_key,
           upper(c_name) AS name,
           upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS nation,
           round(c_acctbal, 2) AS account_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    """,
    doc="filter + upper/initcap normalization; initcap emulated in DuckDB (single-word names).",
)
def q08_normalized_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clean import ColumnSpec, StandardizeSpec, standardize

    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).filter(
        F.col("c_acctbal") > 0
    )
    spec = StandardizeSpec(
        columns=[
            ColumnSpec("c_custkey", name="customer_key"),
            ColumnSpec("c_name", name="name", case="upper"),
            ColumnSpec("n_name", name="nation", case="initcap"),
            ColumnSpec("c_acctbal", name="account_balance"),
        ]
    )
    return standardize(joined, spec).withColumn(
        "account_balance", F.round("account_balance", 2)
    )


# ---------------------------------------------------------------------------
# P7/F11: null probing + defaulting on events.props.
# ---------------------------------------------------------------------------
@register(
    "q09_event_props_quality",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(CASE WHEN props IS NULL OR props = '' THEN 1 END) AS n_missing_props,
           count(DISTINCT coalesce(nullif(props,''), 'Not Provided')) AS n_distinct_props
    FROM events
    GROUP BY event_type
    """,
    doc="null/empty probe (P7) + 'Not Provided' defaulting (F11/F12) in one agg pass.",
)
def q09_event_props_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    missing = F.col("props").isNull() | (F.col("props") == "")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(missing).alias("n_missing_props"),
        F.countDistinct(
            F.coalesce(F.nullif(F.col("props"), F.lit("")), F.lit("Not Provided"))
        ).alias("n_distinct_props"),
    )


# ---------------------------------------------------------------------------
# Semi/anti joins (SURVEY §2.4 note: free in Spark, reference approximated).
# ---------------------------------------------------------------------------
@register(
    "q10_customers_without_big_orders",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
    doc="left_anti join (reference had only left-join-then-dropna approximations).",
)
def q10_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query for entry(): the silver->gold motif end-to-end --
    filter + joins + year/quarter derivation + pivot (SURVEY §7.2 slice 0)."""
    return q05_quarterly_revenue_pivot(spark, sf_dir)
