"""Per-query driver-vs-execution split for the registry bench.

For each registry query (after the same untimed warm-up pass bench.py
does) measures, min-of-N:
  build_s  — fn(spark, sf_dir): py4j plan construction + analysis
  exec_s   — df.collect() on a PRE-BUILT DataFrame object
  e2e_s    — fn(...) + collect, the quantity bench.py times

Usage: python tools/profile_registry.py [N] [name ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imcs_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "imcs-spark-profile", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if names:
        queries = {n: queries[n] for n in names}

    for name, fn in queries.items():  # untimed warm-up (artifacts, codegen)
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:
            print(f"[warmup] {name} FAILED: {e}", file=sys.stderr)

    rows = []
    for name, fn in queries.items():
        bs, es, ts = [], [], []
        try:
            for _ in range(runs):
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                df.collect()
                t2 = time.time()
                bs.append(t1 - t0)
                es.append(t2 - t1)
                ts.append(t2 - t0)
            rows.append(
                {
                    "name": name,
                    "build_s": round(min(bs), 4),
                    "exec_s": round(min(es), 4),
                    "e2e_s": round(min(ts), 4),
                }
            )
        except Exception as e:
            rows.append({"name": name, "error": str(e)[:200]})
    rows.sort(key=lambda r: -(r.get("e2e_s") or 0))
    tb = sum(r.get("build_s", 0) for r in rows)
    te = sum(r.get("exec_s", 0) for r in rows)
    for r in rows:
        print(json.dumps(r))
    print(
        json.dumps(
            {
                "total_build_s": round(tb, 3),
                "total_exec_s": round(te, 3),
                "total_e2e_s": round(sum(r.get("e2e_s", 0) for r in rows), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
