"""Probe 2: which planner/scheduler confs cut per-statement latency on
the cached 6M Quote table, with the cache coalesced to 8 partitions."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imcs_spark.session import get_spark  # noqa: E402


def best(fn, runs=9):
    b = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        el = time.time() - t0
        b = el if b is None else min(b, el)
    return round(b, 4)


FC = "select count(*) as n from quote where close > open * 1.1"
V1 = (
    "select sum(close*volume)/sum(volume) as v from quote "
    "where symbol='S0100' and day between '2010-01-01' and '2012-12-31'"
)
FP = (
    "select day, close from quote where symbol='S0042' "
    "and day between '2010-01-01' and '2010-03-31' and close > open*1.01"
)


def run_set(spark, tag):
    out = {}
    for name, sql in (("fc", FC), ("v1", V1), ("fp", FP)):
        out[f"{name}_{tag}"] = best(lambda s=sql: spark.sql(s).collect())
    return out


def main():
    spark = get_spark("probe-floor2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1000000")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    qpath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata",
        "quotes_6m.parquet",
    )
    q = spark.read.parquet(qpath).coalesce(8).persist()
    q.count()
    q.createOrReplaceTempView("quote")
    spark.sql("select sum(close) from quote").collect()

    res = {}
    res.update(run_set(spark, "base"))

    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    res.update(run_set(spark, "nocp"))

    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        ",".join(
            [
                "org.apache.spark.sql.catalyst.optimizer.ReorderJoin",
                "org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder",
            ]
        ),
    )
    res.update(run_set(spark, "norules"))

    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    res.update(run_set(spark, "arrow"))

    # scheduler-side: locality wait (should already be 0 in local?)
    print("locality.wait =", spark.conf.get("spark.locality.wait", "?"))

    # prepared-plan numbers for the decomposition table
    for name, sql in (("fc", FC), ("v1", V1), ("fp", FP)):
        df = spark.sql(sql)
        df.collect()
        res[f"{name}_prepared"] = best(lambda d=df: d.collect())

    for k, v in res.items():
        print(f"{k:14s} {v:.4f}")


if __name__ == "__main__":
    main()
