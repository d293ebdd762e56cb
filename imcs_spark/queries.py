"""Query registry: one entry per implemented operator family.

Each query has a Spark implementation (engine operators) and a DuckDB
oracle (ANSI SQL) producing identical column names and values. Float
aggregates are rounded to 6 decimals on BOTH sides so value-hashes
match despite summation-order differences.

This module is the coverage ledger the driver executes; tests/ cover
the same operators against golden vectors from the reference suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import aggregates as agg

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects unless nanos are read as long. Set per-session (the
        # driver hands us its own SparkSession), then convert to
        # microsecond TimestampType — matching DuckDB's CAST(ts AS TIMESTAMP).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(c) -> F.Column:
    return F.round(c, 6)


# ---------------------------------------------------------------------------
# TPC-H Q1 — the reference's own benchmark query (tpch.sql:38-89 expresses it
# via cs_filter + cs_hash_sum/avg/count with l_returnflag||l_linestatus keys).
# Spark-first: groupBy two key columns, 8 partial-aggregated measures; the
# filter is pushed to the parquet scan.
# ---------------------------------------------------------------------------
@query(
    "tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6)                                   AS sum_qty,
       ROUND(SUM(l_extendedprice), 6)                              AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)           AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                              AS avg_price,
       ROUND(AVG(l_discount), 6)                                   AS avg_disc,
       CAST(COUNT(*) AS BIGINT)                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r6(F.sum("l_quantity")).alias("sum_qty"),
            _r6(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r6(F.sum(disc_price)).alias("sum_disc_price"),
            _r6(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r6(F.avg("l_quantity")).alias("avg_qty"),
            _r6(F.avg("l_extendedprice")).alias("avg_price"),
            _r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_q1(spark, sf_dir)


# ---------------------------------------------------------------------------
# Grand aggregates (SURVEY §2.5): cs_count/min/max/sum/avg/var/dev/median +
# binary aggs cs_wsum/wavg/corr/cov — one pass over lineitem, all parallel
# partial/final aggregation.
# ---------------------------------------------------------------------------
@query(
    "grand_aggs",
    oracle="""
SELECT CAST(COUNT(l_quantity) AS BIGINT)            AS cnt,
       ROUND(MIN(l_extendedprice), 6)               AS min_price,
       ROUND(MAX(l_extendedprice), 6)               AS max_price,
       ROUND(SUM(l_quantity), 6)                    AS sum_qty,
       ROUND(AVG(l_extendedprice), 6)               AS avg_price,
       ROUND(VAR_POP(l_extendedprice), 4)           AS var_price,
       ROUND(STDDEV_POP(l_extendedprice), 6)        AS dev_price,
       ROUND(MEDIAN(l_quantity), 6)                 AS median_qty,
       ROUND(SUM(l_quantity * l_extendedprice), 4)  AS wsum,
       ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 6) AS wavg,
       ROUND(CORR(l_quantity, l_extendedprice), 6)  AS corr_qp,
       ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS cov_qp
FROM lineitem
""",
)
def grand_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        agg.count("l_quantity").alias("cnt"),
        _r6(agg.min("l_extendedprice")).alias("min_price"),
        _r6(agg.max("l_extendedprice")).alias("max_price"),
        _r6(agg.sum("l_quantity")).alias("sum_qty"),
        _r6(agg.avg("l_extendedprice")).alias("avg_price"),
        F.round(agg.var("l_extendedprice"), 4).alias("var_price"),
        _r6(agg.dev("l_extendedprice")).alias("dev_price"),
        _r6(agg.median("l_quantity")).alias("median_qty"),
        F.round(agg.wsum("l_quantity", "l_extendedprice"), 4).alias("wsum"),
        _r6(agg.wavg("l_quantity", "l_extendedprice")).alias("wavg"),
        _r6(agg.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        F.round(agg.cov("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
    )


# ---------------------------------------------------------------------------
# Hash aggregates (cs_hash_* — true GROUP BY, SURVEY §2.5): per-event-type
# VWAP-style weighted average — the reference's flagship VWAP workload shape
# (user guide perf section) over the events table.
# ---------------------------------------------------------------------------
@query(
    "hash_agg_vwap",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                                AS cnt,
       ROUND(SUM(value), 6)                                    AS sum_value,
       ROUND(SUM(value * user_id) / SUM(user_id), 6)           AS wavg_value,
       ROUND(AVG(value), 6)                                    AS avg_value,
       ROUND(MIN(value), 6)                                    AS min_value,
       ROUND(MAX(value), 6)                                    AS max_value
FROM events
GROUP BY event_type
""",
)
def hash_agg_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        _r6(agg.sum("value")).alias("sum_value"),
        _r6(agg.wavg("user_id", "value")).alias("wavg_value"),
        _r6(agg.avg("value")).alias("avg_value"),
        _r6(agg.min("value")).alias("min_value"),
        _r6(agg.max("value")).alias("max_value"),
    )
