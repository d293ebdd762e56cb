"""One-off probe: decompose the micro-latency job floor on the 6M-row
Quote table. Compares three ways of issuing the same query:

  a) DataFrame API, plan rebuilt inside the timed region (current bench)
  b) one spark.sql(...) statement over a cached temp view (psql-like:
     one round-trip carrying the whole statement)
  c) pre-built DataFrame, timing only .collect() (isolates plan-build
     cost from execution)

and the effect of cached-partition count (32 vs 8) on the 2-stage agg.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imcs_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def best(fn, runs=9):
    b = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        el = time.time() - t0
        b = el if b is None else min(b, el)
    return round(b, 4)


def main():
    spark = get_spark("probe-floor")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1000000")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    qpath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata",
        "quotes_6m.parquet",
    )
    q = spark.read.parquet(qpath).persist()
    n = q.count()
    print("rows", n, "partitions", q.rdd.getNumPartitions())
    q.createOrReplaceTempView("quote")

    # warm everything
    spark.sql("select sum(close) from quote").collect()

    res = {}

    # --- filtered_count ---
    res["fc_df"] = best(
        lambda: q.filter(F.col("close") > F.col("open") * 1.1)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    res["fc_sql"] = best(
        lambda: spark.sql(
            "select count(*) as n from quote where close > open * 1.1"
        ).collect()
    )
    pre = q.filter(F.col("close") > F.col("open") * 1.1).agg(
        F.count(F.lit(1)).alias("n")
    )
    pre.collect()
    res["fc_prebuilt"] = best(lambda: pre.collect())

    # --- vwap_one ---
    res["v1_df"] = best(
        lambda: q.filter(
            (F.col("symbol") == "S0100")
            & F.col("day").between("2010-01-01", "2012-12-31")
        )
        .agg((F.sum(F.col("close") * F.col("volume")) / F.sum("volume")).alias("v"))
        .collect()
    )
    res["v1_sql"] = best(
        lambda: spark.sql(
            "select sum(close*volume)/sum(volume) as v from quote "
            "where symbol='S0100' and day between '2010-01-01' and '2012-12-31'"
        ).collect()
    )

    # --- filter_project ---
    res["fp_df"] = best(
        lambda: q.filter(
            (F.col("symbol") == "S0042")
            & F.col("day").between("2010-01-01", "2010-03-31")
            & (F.col("close") > F.col("open") * 1.01)
        )
        .select("day", "close")
        .collect()
    )
    res["fp_sql"] = best(
        lambda: spark.sql(
            "select day, close from quote where symbol='S0042' "
            "and day between '2010-01-01' and '2010-03-31' and close > open*1.01"
        ).collect()
    )

    # --- partition-count effect on the 2-stage agg ---
    for parts in (8, 4):
        qq = spark.read.parquet(qpath).coalesce(parts).persist()
        qq.count()
        qq.createOrReplaceTempView(f"quote{parts}")
        spark.sql(f"select sum(close) from quote{parts}").collect()
        res[f"fc_sql_p{parts}"] = best(
            lambda: spark.sql(
                f"select count(*) as n from quote{parts} where close > open * 1.1"
            ).collect()
        )
        res[f"v1_sql_p{parts}"] = best(
            lambda: spark.sql(
                f"select sum(close*volume)/sum(volume) as v from quote{parts} "
                "where symbol='S0100' and day between '2010-01-01' and '2012-12-31'"
            ).collect()
        )
        qq.unpersist()

    # floor probes
    res["floor_range32"] = best(lambda: spark.range(0, 32, 1, 32).count())
    res["floor_agg"] = best(
        lambda: spark.range(0, 32, 1, 32).agg(F.sum("id")).collect()
    )
    res["floor_sql_1row"] = best(lambda: spark.sql("select 1").collect())

    for k, v in res.items():
        print(f"{k:18s} {v:.4f}")


if __name__ == "__main__":
    main()
