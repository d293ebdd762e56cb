"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). A tiny
warm-up query runs first so JVM/codegen startup isn't billed to the
first workload.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imcs_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("imcs-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer reads, Python/Arrow workers
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(1000).select(_warm(F.col("id").cast("double"))).collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Smoke gate: one broken query must never zero out the whole bench
    # (round 2 lost its entire bench to a single AnalysisException).
    # Each query is wrapped; a failure is recorded per-query and the
    # run continues.
    for name, fn in entry_mod.queries().items():
        best = None
        try:
            for _ in range(runs):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.collect()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            timings[name] = round(best, 4)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"[bench] query {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "imcs_spark_headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        # A failed query would make the partial sum silently SMALLER —
        # i.e. look faster across rounds. Keep the per-query timings
        # but mark the headline number invalid instead of emitting a
        # misleading partial total.
        payload["errors"] = errors
        payload["value"] = None
        payload["failed"] = True

    # Same-scale section: BASELINE.md's numbers were measured at 6M/10M
    # rows — 10-60x sf0.1 — so per-query wall ratios at sf0.1 measure
    # Spark's fixed floor, not throughput. Generate reference-scale
    # tables (once, cached under benchdata/) and run the exact baseline
    # query set; see imcs_spark/bench_scale.py and BENCH_SCALE.md.
    # Never allowed to break the bench line: failures are reported
    # inline instead.
    if os.environ.get("SPARK_GRAFT_SCALE", "1") != "0":
        try:
            from imcs_spark.bench_scale import run_scale

            # The scale section is its own benchmark: release the query
            # registry's persisted artifacts first so the 6M/10M-row
            # tables get the full storage pool instead of competing
            # with ~60 leftover caches (which skews load_* by 5-20x).
            spark.catalog.clearCache()

            data_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchdata"
            )
            payload["scale"] = run_scale(spark, data_dir, runs=runs)
        except Exception as e:  # pragma: no cover - safety net
            payload["scale"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
