"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [query ...]
  tag    subdirectory under plans/ and filename suffix: plans/r13/<q>_<tag>.txt
         (use 'r13/before' -> plans/r13/<q>_before.txt)
  query  registry names; default = all 50.

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with the
same get_spark session bench.py uses, so plan shapes (shuffle partition
counts, AQE nodes) match the bench. Plans are captured AFTER a warm-up
build of the shared artifacts so cached-table scans show as
InMemoryTableScan exactly as the timed bench runs see them.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imcs_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "/" in tag:
        sub, suffix = tag.rsplit("/", 1)
        out_dir = os.path.join(here, "plans", sub)
    else:
        out_dir, suffix = os.path.join(here, "plans"), tag
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("imcs-spark-plandump", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if not names:
        names = list(queries)
    for name in names:
        fn = queries[name]
        # warm-up: build shared artifacts so the captured plan reads
        # from the persisted stores like the timed bench pass does
        df = fn(spark, sf_dir)
        df.collect()
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
