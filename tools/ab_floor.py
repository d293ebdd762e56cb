"""A/B the AQE coalescePartitions.minPartitionNum floor (r13's
session-wide setting, r13-verdict item 1) against targeted per-operator
spreads, on the workloads the floor was protecting: the stretch-6M soak
and the LSH mega-star section.

Interleaved trials in ONE session (conf toggled between trials — AQE
reads the conf at execution time), min-of-N per arm, same convention as
the r13 A/B that measured floor32 2.09 s vs default 8.05 s on stretch-6M.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_floor.py [stretch|lsh|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from imcs_spark.session import get_spark

FLOOR_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionNum"


def _arms(spark):
    cpus = spark.sparkContext.defaultParallelism

    def floor_on():
        spark.conf.set(FLOOR_KEY, str(cpus))

    def floor_off():
        spark.conf.unset(FLOOR_KEY)

    return [("floor_off", floor_off), ("floor_on", floor_on)]


def ab(spark, name: str, build, runs: int = 3):
    """Interleave floor_off/floor_on trials; print min per arm."""
    mins: dict[str, float] = {}
    for i in range(runs):
        for arm, setter in _arms(spark):
            setter()
            t0 = time.time()
            build().collect()
            el = time.time() - t0
            mins[arm] = min(mins.get(arm, 1e9), el)
            print(f"  [{name}] trial {i} {arm}: {el:.3f}s", flush=True)
    spark.conf.unset(FLOOR_KEY)
    print(
        f"[{name}] min floor_off={mins['floor_off']:.3f}s "
        f"floor_on={mins['floor_on']:.3f}s "
        f"ratio off/on={mins['floor_off'] / mins['floor_on']:.2f}",
        flush=True,
    )
    return mins


def run_stretch(spark, data_dir: str):
    from imcs_spark.operators import joins

    q6 = os.path.join(data_dir, "quotes_6m.parquet")
    quotes = spark.read.parquet(q6).select("symbol", "day", "close").persist()
    n = quotes.count()
    print(f"quotes_6m rows={n}")
    # probe: same shape as bench_scale._probe_frame (1M rows, 20% hot)
    from imcs_spark.bench_scale import N_SYMBOLS, QUOTE_ROWS, _probe_frame

    probe = _probe_frame(spark, QUOTE_ROWS // 6, N_SYMBOLS, seed=77).persist()
    probe.count()
    w = Window.partitionBy("symbol").orderBy("day")
    spine = quotes.withColumn("pos", F.row_number().over(w) - 1).persist()
    ts2 = spine.select(
        "symbol", "pos", F.datediff("day", F.lit("2000-01-01")).alias("val")
    ).persist()
    vals = spine.select(
        "symbol", "pos", F.col("close").cast("double").alias("val")
    ).persist()
    wp = Window.partitionBy("symbol").orderBy("day", "probe_id")
    ts1 = (
        probe.withColumn("pos", F.row_number().over(wp) - 1)
        .select("symbol", "pos", F.datediff("day", F.lit("2000-01-01")).alias("val"))
        .persist()
    )
    ts2.count(); vals.count(); ts1.count()
    spine.unpersist()

    def _stretch():
        s = joins.stretch(
            ts1, ts2, vals, filler=-1.0, val_col="val", partition_by=["symbol"]
        )
        return s.agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sv"))

    ab(spark, "stretch_6m", _stretch)

    def _asof():
        j = joins.asof_join_multi(
            probe, quotes, on="day", by=["symbol"],
            right_cols=["close"], directions=("backward", "nearest"),
        )
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("close_backward").alias("sb"),
            F.sum("close_nearest").alias("sn"),
        )

    ab(spark, "asof_6m", _asof)
    for fdf in (quotes, probe, ts1, ts2, vals):
        fdf.unpersist()


def run_lsh(spark):
    from imcs_spark.bench_scale import _mega_docs
    from imcs_spark.pipeline import dedup

    docs = _mega_docs(spark, 1000, 3000).persist()
    docs.count()
    sigs = dedup.minhash_signatures(docs, num_hashes=32).persist()
    sigs.count()

    def _star():
        return dedup.minhash_lsh_candidates(
            sigs, num_hashes=32, bands=16, pair_mode="star", max_bucket=100_000
        ).groupBy().count()

    ab(spark, "lsh_mega_star", _star)

    docs10 = _mega_docs(spark, 10_000, 5_000).persist()
    docs10.count()
    sigs10 = dedup.minhash_signatures(docs10, num_hashes=32).persist()
    sigs10.count()

    def _star10():
        return dedup.minhash_lsh_candidates(
            sigs10, num_hashes=32, bands=16, pair_mode="star", max_bucket=100_000
        ).groupBy().count()

    ab(spark, "lsh_mega10k_star", _star10)
    for f in (docs, sigs, docs10, sigs10):
        f.unpersist()


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "imcs-ab-floor", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # NOTE: session.py may still set the floor at build time; normalize
    # to OFF before the first arm runs.
    try:
        spark.conf.unset(FLOOR_KEY)
    except Exception:
        pass
    if what in ("stretch", "all"):
        run_stretch(spark, data_dir)
    if what in ("lsh", "all"):
        run_lsh(spark)


if __name__ == "__main__":
    main()
