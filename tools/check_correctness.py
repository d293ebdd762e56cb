"""Local simulation of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB
over the same parquet tables, then compares row count, sorted column
names, and order-insensitive values (floats to 1e-9 abs / 1e-6 rel).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def rows_to_multiset(rows, colnames):
    # Alignment caveat: both sides sort by the stringified rounded row,
    # then compare pairwise with tolerance. Rows whose float cells
    # straddle a rounding/sort boundary could misalign — every
    # registered query guards against this by rounding its float
    # outputs IN THE QUERY (Spark and oracle alike), so the sort keys
    # are bit-identical whenever values match. Granularity must be
    # MAGNITUDE-AWARE for extensive sums: summation-order noise scales
    # with the sum (~1e-6 at 1e8, ~1e-2 at 3e9 — and past ~1e10 a 6dp
    # step is inside double ULP itself), so intensive stats (means,
    # ratios, per-row values) round at 6dp while sums of magnitude
    # >=1e7 round at >=100x their noise (2dp at 1e7, integers at 1e8+,
    # tens at 1e10+). Keep that convention when adding queries.
    # lowercased sort key: both sides' multisets must order columns
    # identically even when Spark and DuckDB report different casings
    # (round-12 ADVICE fix — a casing-dependent sort made leg_breakdown
    # read the wrong column on one side)
    order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


EXACT = os.environ.get("EXACT", "") == "1"


def values_close(a, b):
    if EXACT:
        # simulate the driver's value-hash: exact equality post-round
        if type(a) is float and type(b) is float:
            return a == b or (math.isnan(a) and math.isnan(b))
        return a == b
    if type(a) is float or type(b) is float:
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= max(1e-9, 1e-6 * max(abs(af), abs(bf)))
    return a == b


LEG_COLS = ("op", "leg", "metric", "kind")


def _leg_index(sorted_cols):
    low = [c.lower() for c in sorted_cols]
    for cand in LEG_COLS:
        if cand in low:
            return low.index(cand)
    return None


def _rows_equal(ra, rb):
    return all(values_close(va, vb) for va, vb in zip(ra, rb))


def leg_breakdown(a, b, sorted_cols):
    """Localize a composite-query failure: group the (already sorted-
    column) row multisets by their leg-label column (op/leg/metric/
    kind) and name every leg whose row group diverges. Returns [] when
    no leg column exists. A 9-leg composite like series_ops otherwise
    fails as ONE opaque hash mismatch."""
    li = _leg_index(sorted_cols)
    if li is None:
        return []
    ga, gb = {}, {}
    for r in a:
        ga.setdefault(r[li], []).append(r)
    for r in b:
        gb.setdefault(r[li], []).append(r)
    divergent = []
    for leg in sorted(set(ga) | set(gb), key=str):
        ra, rb = ga.get(leg, []), gb.get(leg, [])
        if len(ra) != len(rb):
            divergent.append(f"{leg} (rows {len(ra)} vs {len(rb)})")
        elif not all(_rows_equal(x, y) for x, y in zip(ra, rb)):
            divergent.append(str(leg))
    return divergent


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    sorted_cols = sorted(spark_cols, key=lambda c: c.lower())
    a = rows_to_multiset(spark_rows, spark_cols)
    b = rows_to_multiset(duck_rows, duck_cols)
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
        legs = leg_breakdown(a, b, sorted_cols)
        if legs:
            problems.append(f"divergent leg(s): {', '.join(legs)}")
        return problems
    bad = 0
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if not values_close(va, vb):
                bad += 1
                if bad <= 3:
                    problems.append(f"value mismatch: {ra} vs {rb}")
                break
    if bad > 3:
        problems.append(f"... {bad} mismatched rows total")
    if bad:
        legs = leg_breakdown(a, b, sorted_cols)
        if legs:
            problems.append(f"divergent leg(s): {', '.join(legs)}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from imcs_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo would otherwise skip everything and exit 0 (vacuous
        # success for any CI invocation checking one query)
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        print(f"registered: {sorted(qs)}")
        sys.exit(2)
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(spark_rows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems[:5]:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(spark_rows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
