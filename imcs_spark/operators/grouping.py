"""Grouped aggregation families: run-based, windowed-run, grid, hash,
dup-count, histogram — SURVEY §2.5.

Reference:
- cs_group_*     IMCS_GROUP_AGG_DEF func.c:1898-2169 — groups are
  *consecutive runs* of equal group-by values, not global keys.
- cs_win_group_* IMCS_WIN_GROUP_AGG_DEF func.c:6594-6784 — same runs,
  aggregate repeated back onto every element of its run.
- cs_grid_*      IMCS_GRID_AGG_DEF func.c:2170-2267 — fixed-size
  positional buckets (tumbling count windows).
- cs_hash_*      IMCS_HASH_AGG_DEF func.c:5113-5459 — true GROUP BY
  via chained hash table, parallel partial tables + merge.
- cs_hash_dup_count func.c:5750-6216 — per group, number of distinct
  input values occurring ≥ min_occurrences.
- cs_histogram   func.c:4071-4151 — fixed-range bucket counts.

Spark: run-ids come from the shared sessionization helper
(series.run_id — one window chain); everything else is groupBy, which
Catalyst executes as partial/final hash aggregation — the exact model
the reference hand-built with per-thread hash tables (imcs.c:1874).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..series import POS, VAL, run_id

_AGGS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "var": F.var_pop,
    "dev": F.stddev_pop,
    "all": F.bit_and,
    "any": F.bit_or,
    "approxdc": F.approx_count_distinct,
}


def _group_expr(agg: str, target, pos=None):
    """Aggregate expression for one run group. first/last are RUN-order
    first/last (reference cs_group_first/last semantics), anchored to
    POS with min_by/max_by — F.first/F.last inside an unordered groupBy
    would be arrival-order-dependent after the shuffle."""
    if agg == "first":
        return F.min_by(target, pos if pos is not None else F.col(POS))
    if agg == "last":
        return F.max_by(target, pos if pos is not None else F.col(POS))
    return _AGGS[agg](target)


def group_agg(
    df: DataFrame,
    agg: str,
    group_col: str,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """cs_group_<agg>(value, group_by): one row per *run* of equal
    group_by values, in run order. Output: (pos=run index, group_val,
    <agg>)."""
    out_name = out_col or f"group_{agg}"
    rid = run_id(df, group_col, (POS,), partition_by)
    keys = ([*partition_by] if partition_by else []) + ["run_id"]
    target = F.col(val_col) if agg != "count" else F.lit(1)
    agged = rid.groupBy(*keys).agg(
        F.first(group_col).alias(group_col), _group_expr(agg, target).alias(out_name)
    )
    return agged.withColumnRenamed("run_id", POS)


def group_aggs(
    df: DataFrame,
    aggs: dict[str, tuple[str, str]],
    group_col: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Multi-aggregate run grouping in ONE pass: {out_col: (agg,
    val_col)}. Same run semantics as group_agg; avoids re-sessionizing
    and re-shuffling per aggregate."""
    rid = run_id(df, group_col, (POS,), partition_by)
    keys = ([*partition_by] if partition_by else []) + ["run_id"]
    exprs = [F.first(group_col).alias(group_col)]
    for out_col, (agg, val_col) in aggs.items():
        target = F.lit(1) if agg == "count" else F.col(val_col)
        exprs.append(_group_expr(agg, target).alias(out_col))
    return rid.groupBy(*keys).agg(*exprs).withColumnRenamed("run_id", POS)


def win_group_agg(
    df: DataFrame,
    agg: str,
    group_col: str,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """cs_win_group_<agg>: run-aggregate repeated onto each element of
    its run (unbounded window per run)."""
    out_name = out_col or f"win_group_{agg}"
    rid = run_id(df, group_col, (POS,), partition_by)
    parts = ([*partition_by] if partition_by else []) + ["run_id"]
    w = Window.partitionBy(*parts)
    target = F.col(val_col) if agg != "count" else F.lit(1)
    if agg in ("first", "last"):
        # run-order first/last: make the window ordered so F.first/last
        # are deterministic (not shuffle-arrival order)
        wo = Window.partitionBy(*parts).orderBy(POS).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        fn = F.first if agg == "first" else F.last
        return rid.withColumn(out_name, fn(target).over(wo)).drop("run_id")
    fn = _AGGS[agg]
    return rid.withColumn(out_name, fn(target).over(w)).drop("run_id")


def win_group_aggs(
    df: DataFrame,
    aggs: dict[str, tuple[str, str]],
    group_col: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Multi-aggregate form of :func:`win_group_agg` (the dict
    convention :func:`group_aggs` already uses): {out_col: (agg,
    val_col)}. Chained single-agg calls each re-derive run_id — two
    lag Windows + a cumulative-sum Window + a sort PER CALL — because
    the single-agg API drops run_id on return; computing every
    aggregate over ONE run_id derivation plans one shared Window node
    (r13, guide §2.1: fewer full-data passes). first/last stay on the
    single-agg API (they need the ordered per-run frame).

    Results are identical to chaining win_group_agg per entry, pinned
    by tests/test_operators_grouping.py."""
    for out_name, (agg, _v) in aggs.items():
        if agg in ("first", "last"):
            raise ValueError(
                f"win_group_aggs: {agg!r} needs the ordered frame — "
                "use win_group_agg for first/last"
            )
        if agg not in _AGGS:
            raise ValueError(f"win_group_aggs: unknown agg {agg!r}")
    rid = run_id(df, group_col, (POS,), partition_by)
    parts = ([*partition_by] if partition_by else []) + ["run_id"]
    w = Window.partitionBy(*parts)
    cols = [
        _AGGS[agg](F.col(val) if agg != "count" else F.lit(1)).over(w).alias(out_name)
        for out_name, (agg, val) in aggs.items()
    ]
    return rid.select("*", *cols).drop("run_id")


def grid_agg(
    df: DataFrame,
    agg: str,
    interval: int,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """cs_grid_<agg>(value, interval): tumbling positional buckets of
    `interval` elements; output pos = bucket index."""
    out_name = out_col or f"grid_{agg}"
    bucket = F.floor(F.col(POS) / interval).cast("long")
    keys = ([*partition_by] if partition_by else [])
    target = F.col(val_col) if agg != "count" else F.lit(1)
    return (
        df.withColumn("_bucket", bucket)
        .groupBy(*keys, "_bucket")
        .agg(_group_expr(agg, target).alias(out_name))
        .withColumnRenamed("_bucket", POS)
    )


def hash_agg(
    df: DataFrame,
    aggs: dict[str, tuple[str, str]],
    group_by: Sequence[str],
) -> DataFrame:
    """cs_hash_* — true GROUP BY. aggs: {out_col: (agg_name, val_col)}.
    Compound keys are just multiple columns (the reference packs them
    into byte-concat keys, cs_cat, and unpacks with cs_cut — both
    unnecessary here, SURVEY §2.5)."""
    exprs = []
    for out_col, (agg, val_col) in aggs.items():
        if agg in ("first", "last") and POS not in df.columns:
            raise ValueError(
                "hash_agg first/last requires a pos column to define order "
                "(unordered groupBy first/last is shuffle-nondeterministic)"
            )
        target = F.lit(1) if agg == "count" else F.col(val_col)
        exprs.append(_group_expr(agg, target).alias(out_col))
    return df.groupBy(*group_by).agg(*exprs)


def hash_dup_count(
    df: DataFrame,
    val_col: str,
    group_by: Sequence[str],
    min_occurrences: int = 1,
    out_col: str = "dup_count",
) -> DataFrame:
    """cs_hash_dup_count (func.c:5750-6216): per group, the number of
    distinct values occurring at least min_occurrences times. Two-level
    aggregation — both levels partial/final parallel."""
    lvl1 = df.groupBy(*group_by, val_col).agg(F.count(F.lit(1)).alias("_occ"))
    return (
        lvl1.filter(F.col("_occ") >= min_occurrences)
        .groupBy(*group_by)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def histogram(
    df: DataFrame,
    low: float,
    high: float,
    n_intervals: int,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """cs_histogram (func.c:4071-4151): counts per fixed-width bucket
    over [low, high); values outside the range are ignored (reference
    skips them). Output: (pos=bucket, count) with empty buckets as 0."""
    width = (high - low) / n_intervals
    keys = [*partition_by] if partition_by else []
    # clamp to the last bucket: float rounding can push a value just
    # below `high` to floor(...) == n_intervals, a bucket the densify
    # grid doesn't contain — the left join would silently drop its
    # count (the reference's fixed-point loop always lands in-range)
    bucket = F.least(
        F.floor((F.col(val_col) - low) / width), F.lit(n_intervals - 1)
    ).cast("long")
    counts = (
        df.filter((F.col(val_col) >= low) & (F.col(val_col) < high))
        .withColumn("_bucket", bucket)
        .groupBy(*keys, "_bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    # densify: emit all buckets, 0 for empty (reference emits the full grid)
    spark = df.sparkSession
    grid = spark.range(n_intervals).select(F.col("id").alias("_bucket"))
    if keys:
        key_rows = df.select(*keys).distinct()
        grid = key_rows.crossJoin(F.broadcast(grid))
        # NULL-safe key equality: distinct() emits NULL-keyed grid
        # rows and counts holds their real bucket counts, but a plain
        # equi-join never matches NULL keys — every NULL-keyed group
        # silently reported all-zero counts (same hazard class as
        # series.run_id's eqNullSafe)
        cond = F.col("g._bucket") == F.col("c._bucket")
        for k in keys:
            cond = cond & F.col(f"g.{k}").eqNullSafe(F.col(f"c.{k}"))
        out = (
            grid.alias("g")
            .join(counts.alias("c"), cond, "left")
            .select(
                *[F.col(f"g.{k}") for k in keys],
                F.col("g._bucket").alias("_bucket"),
                F.coalesce(F.col("c.count"), F.lit(0)).alias("count"),
            )
        )
        return out.withColumnRenamed("_bucket", POS)
    out = grid.join(counts, on=["_bucket"], how="left").withColumn(
        "count", F.coalesce(F.col("count"), F.lit(0))
    )
    return out.withColumnRenamed("_bucket", POS)
