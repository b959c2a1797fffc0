"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grouped t-digest sketch over
lineitem prices with quantile/cdf/trimmed-mean reads) at sf0.001.
``queries()`` exposes every implemented operator; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for the exactly-checkable ones.  Sketch
estimates (p50/p95/p99, cdf, trimmed quantile ranges) are approximate by
construction and cannot hash-match an exact oracle — those entries omit
the oracle (rows-only driver check) and their tight error bounds are
enforced in tests/ instead (same split the reference uses:
tdigest_test.go checks bounds, not equality).

Exactness trick used throughout: t-digest tails are exact singletons
(min/max == Quantile(0)/Quantile(1)), counts are exact under merge
(tdigest.go:218-220), and TrimmedMean(0,1) is the exact weighted mean up
to float rounding — so those digest reads ARE hash-comparable against
min/max/count/round(avg,4) oracles, which pins the whole scan -> partial
-> salted merge -> query pipeline end to end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_tdigest_spark.functions import (
    td_cdf,
    td_count,
    td_quantile,
    td_trimmed_mean,
)
from go_tdigest_spark.operators import tdigest_agg
from go_tdigest_spark.sources import table

SF_TINY = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-returnflag price distribution sketch on sf0.001."""
    li = table(spark, SF_TINY, "lineitem")
    digests = tdigest_agg(li, "l_extendedprice", by=["l_returnflag"])
    return digests.select(
        "l_returnflag",
        td_count("digest").alias("n"),
        td_quantile("digest", 0.0).alias("min_price"),
        td_quantile("digest", 0.5).alias("p50"),
        td_quantile("digest", 0.95).alias("p95"),
        td_quantile("digest", 0.99).alias("p99"),
        td_quantile("digest", 1.0).alias("max_price"),
        td_trimmed_mean("digest", 0.1, 0.9).alias("trimmed_mean_10_90"),
        td_cdf("digest", 50000.0).alias("cdf_50k"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _q_td_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    d = tdigest_agg(li, "l_extendedprice", by=["l_returnflag"])
    return d.select(
        "l_returnflag",
        td_count("digest").alias("n"),
        td_quantile("digest", 0.0).alias("min_price"),
        td_quantile("digest", 1.0).alias("max_price"),
    )


def _q_td_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = tdigest_agg(ev, "value", by=["event_type"])
    return d.select(
        "event_type",
        td_count("digest").alias("n"),
        td_quantile("digest", 0.0).alias("min_value"),
        td_quantile("digest", 1.0).alias("max_value"),
    )


def _q_td_mean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = tdigest_agg(docs, "n_chars", by=["source"])
    return d.select(
        "source",
        td_count("digest").alias("n"),
        F.round(td_trimmed_mean("digest", 0.0, 1.0), 4).alias("mean_chars"),
    )


def _q_td_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    d = tdigest_agg(li, "l_extendedprice", by=["l_returnflag"])
    return d.select(
        "l_returnflag",
        td_quantile("digest", 0.5).alias("p50"),
        td_quantile("digest", 0.95).alias("p95"),
        td_quantile("digest", 0.99).alias("p99"),
    )


def _q_td_cdf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = tdigest_agg(ev, "value", by=["event_type"])
    return d.select(
        "event_type",
        td_cdf("digest", 10.0).alias("cdf_10"),
        td_cdf("digest", 100.0).alias("cdf_100"),
        td_trimmed_mean("digest", 0.25, 0.75).alias("iqm"),
    )


def _q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1-shaped exact aggregation: validates scan -> hash agg plumbing
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


def _q_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # broadcast join of the small dimension onto the fact table
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )
    )


def _q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = orders.withColumn("rk", F.row_number().over(w))
    return ranked.where(F.col("rk") == 1).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )


def _q_sort_limit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "td_stats_lineitem": _q_td_stats_lineitem,
        "td_stats_events": _q_td_stats_events,
        "td_mean_documents": _q_td_mean_documents,
        "td_quantiles_lineitem": _q_td_quantiles_lineitem,
        "td_cdf_events": _q_td_cdf_events,
        "agg_pricing_summary": _q_agg_pricing_summary,
        "join_customer_orders": _q_join_customer_orders,
        "window_top_orders": _q_window_top_orders,
        "sort_limit_orders": _q_sort_limit_orders,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "td_stats_lineitem": """
            SELECT l_returnflag,
                   count(l_extendedprice) AS n,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "td_stats_events": """
            SELECT event_type,
                   count(value) AS n,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "td_mean_documents": """
            SELECT source,
                   count(n_chars) AS n,
                   round(avg(n_chars), 4) AS mean_chars
            FROM documents GROUP BY source
        """,
        # td_quantiles_lineitem / td_cdf_events: sketch estimates — no exact
        # SQL equivalent; driver records rows-only, bounds enforced in tests/
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS count_order,
                   sum(l_quantity) AS sum_qty,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price,
                   round(avg(l_quantity), 4) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_customer_orders": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   min(o_totalprice) AS min_total,
                   max(o_totalprice) AS max_total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "window_top_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rk
                FROM orders
            ) WHERE rk = 1
        """,
        "sort_limit_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
    }
