"""Moving-window, cumulative aggregates and recurrences (EMA/ATR).

Reference: IMCS_WINDOW_AGG_DEF func.c:1632-1790 (window_sum/avg/min/
max/var/dev over the last N elements; the first N-1 outputs read a
ZERO-INITIALIZED circular history — avg divides by N from the first
element, min/max see the padding zeros; see moving_agg's `warmup`
modes and expected/windowagg.out), EMA recurrence func.c:1764-1778,
ATR func.c:1779-1790, IMCS_CUMULATIVE_AGG_DEF func.c:1791-1897
(cum_sum/avg/min/max/prd/var/dev).

Spark mapping:
- moving aggs → Window.rowsBetween(-(N-1), 0): JVM-side, streaming
  window frame, parallel across series.
- cumulative  → rowsBetween(unboundedPreceding, 0).
- EMA/ATR are sequential linear recurrences. Per-series they run as a
  vectorized Arrow-batched applyInPandas (one pandas group per series —
  the common case: millions of independent series at 100 TB). For one
  giant global series we use the *linear-recurrence splitting* trick:
  e_i = local_i + decay^(i+1) · carry_in, so each partition computes its
  local recurrence independently, the tiny per-partition carries are
  combined sequentially on the driver (P values, not N), and a second
  pass applies carry-ins — exact, two passes, no single-node bottleneck.
  (The reference's answer was simply "this op is not context-free → run
  single-threaded", imcs.h:110, imcs.c:1886-1908; we can do better.)
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..series import POS, VAL

_MOVING = {
    "sum": F.sum,
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "var": F.var_pop,
    "dev": F.stddev_pop,
    "count": F.count,
}


def _frame(partition_by: Sequence[str] | None, order_col: str = POS):
    if partition_by:
        return Window.partitionBy(*partition_by).orderBy(order_col)
    return Window.orderBy(order_col)


def moving_agg(
    df: DataFrame,
    agg: str,
    n: int,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
    order_col: str = POS,
    warmup: str = "partial",
) -> DataFrame:
    """cs_window_{sum,avg,max,min,var,dev}: sliding window of the last
    n elements; output length = input length.

    warmup controls the first n-1 values of each series:
    - 'partial' (default, Spark-native): aggregate over however many
      elements exist so far — SQL window-frame semantics.
    - 'reference': bit-parity with the C engine's zero-initialized
      circular history (IMCS_WINDOW_AGG_DEF func.c:1632-1763): the
      window is ALWAYS n elements, the missing ones are zeros. So
      avg divides by n even during warm-up, min/max see the padding
      zeros (expected/windowagg.out:{7-11,19-23}), and var/dev use
      (Σx² − (Σx)²/n)/n with n = interval. Assumes non-null values,
      like the reference (series have no NULLs). sum is identical in
      both modes (zeros add nothing).
    """
    if warmup not in ("partial", "reference"):
        raise ValueError(f"moving_agg: unknown warmup mode {warmup!r}")
    out_name = out_col or f"window_{agg}"
    w = _frame(partition_by, order_col).rowsBetween(-(n - 1), 0)
    fn = _MOVING[agg]
    if warmup == "partial" or agg in ("sum", "count"):
        return df.withColumn(out_name, fn(F.col(val_col)).over(w))
    c = F.col(val_col)
    # Skip the to-double cast when the column is already double: a cast
    # (even a no-op one) inside a window function makes Catalyst's
    # ExtractWindowExpressions hoist it into a Project BETWEEN this
    # Window and any neighboring one over the same spec, which defeats
    # the CollapseWindow rule — chained moving_agg calls then run one
    # Window pass per call instead of one total (guide §2.1: fewer
    # full-data passes). Bit-identical: cast(double AS double) is the
    # identity.
    from pyspark.sql.types import DoubleType

    cd = c if isinstance(df.schema[val_col].dataType, DoubleType) else c.cast("double")
    rows_in = F.count(F.lit(1)).over(w)  # < n only during warm-up
    if agg in ("min", "max"):
        # zero in the ELEMENT type: reference min/max keep elem type
        zero = F.lit(0).cast(df.schema[val_col].dataType)
        partial = fn(c).over(w)
        pad = F.least(partial, zero) if agg == "min" else F.greatest(partial, zero)
        expr = F.when(rows_in < n, pad).otherwise(partial)
    elif agg == "avg":
        expr = F.sum(cd).over(w) / F.lit(float(n))
    else:  # var / dev — raw-moment form, unclamped like the C code
        s = F.sum(cd).over(w)
        s2 = F.sum(cd * cd).over(w)
        expr = (s2 - s * s / n) / n
        if agg == "dev":
            expr = F.sqrt(expr)
    return df.withColumn(out_name, expr)


def cum_agg(
    df: DataFrame,
    agg: str,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
    order_col: str = POS,
) -> DataFrame:
    """cs_cum_{sum,avg,max,min,var,dev}: prefix aggregates."""
    w = _frame(partition_by, order_col).rowsBetween(Window.unboundedPreceding, 0)
    fn = _MOVING[agg]
    return df.withColumn(out_col or f"cum_{agg}", fn(F.col(val_col)).over(w))


def cum_prd(
    df: DataFrame,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "cum_prd",
    order_col: str = POS,
) -> DataFrame:
    """cs_cum_prd: running product — sign-aware log-space prefix
    (zero poisons the suffix, matching a true running product)."""
    w = _frame(partition_by, order_col).rowsBetween(Window.unboundedPreceding, 0)
    c = F.col(val_col)
    log_sum = F.sum(F.log(F.abs(F.nullif(c.cast("double"), F.lit(0.0))))).over(w)
    n_zero = F.sum(F.when(c == 0, 1).otherwise(0)).over(w)
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0)).over(w)
    sign = F.when(n_neg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return df.withColumn(out_col, F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * F.exp(log_sum)))


def _recurrence_apply(
    df: DataFrame,
    partition_by: Sequence[str] | None,
    val_col: str,
    kernels: dict,
    order_col: str = POS,
) -> DataFrame:
    """Run per-series sequential kernels as ONE Arrow-batched grouped
    pandas pass. kernels: {out_col: fn(values: pd.Series) -> pd.Series}
    — multiple recurrences share the transfer and the sort. An out_col
    that already exists on the frame is REPLACED (withColumn
    semantics) — keeping it would emit a duplicate schema field and an
    Arrow column-count error at execution."""
    keys = list(partition_by) if partition_by else []
    used = {val_col, order_col, *keys}
    bad = [c for c in kernels if c in used]
    if bad:
        raise ValueError(
            f"recurrence out_col(s) {bad} collide with input columns the "
            "computation reads (value/order/partition)"
        )
    clash = [c for c in kernels if c in df.columns]
    # withColumn semantics: a replaced column keeps its ORIGINAL
    # position; brand-new kernel columns append at the end. The pandas
    # pass emits replaced columns last, so reorder on the way out.
    out_order = df.columns + [c for c in kernels if c not in df.columns]
    if clash:
        df = df.drop(*clash)
    schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(schema_parts + [f"{c} double" for c in kernels])

    if not keys:
        # single global series: one sequential group — the fallback the
        # reference also takes for non-context-free ops (imcs.c:1886-1908);
        # see ema_global for the scalable splitting alternative.
        def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_col)
            for out_col, kernel in kernels.items():
                pdf[out_col] = kernel(pdf[val_col]).astype("float64")
            return pdf

        df = df.withColumn("_g", F.lit(0))
        return (
            df.groupBy("_g")
            .applyInPandas(apply_fn, schema="_g int, " + schema)
            .drop("_g")
            .select(*out_order)
        )

    # Keyed path: mapInPandas over hash-partitioned, (keys, order)-sorted
    # partitions — ONE Arrow conversion per partition instead of one per
    # group (groupBy().applyInPandas ships a batch per group, which is
    # overhead-bound when series are small and numerous). Groups are
    # contiguous and internally ordered after sortWithinPartitions, so
    # the kernel loop runs inside pandas.
    part = df.repartition(*keys).sortWithinPartitions(*keys, order_col)

    def gen(batches):
        import numpy as np

        chunks = list(batches)
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0].reset_index(drop=True)
        )
        n = len(pdf)
        if n == 0:
            yield pdf
            return
        # Groups are contiguous runs after the (keys, order) sort —
        # find boundaries with one vector compare per key column and
        # write kernel outputs by positional slice. (pandas groupby +
        # index-aligned .loc writes cost ~ms per group, which dominates
        # when series are small and numerous.)
        change = np.zeros(n - 1, dtype=bool)
        for k in keys:
            a = pdf[k].to_numpy()
            neq = a[1:] != a[:-1]
            if a.dtype.kind in "fmM":
                # NULL-safe: Arrow->pandas turns nullable-numeric NULLs
                # into NaN and date/time NULLs into NaT, and NaN != NaN
                # (NaT != NaT) is True — without masking, every
                # consecutive null-keyed pair became a group boundary
                # and the recurrence silently restarted per row. Two
                # NaN/NaT keys are the SAME group (object-dtype keys
                # already behave that way: None != None is False).
                both_na = pd.isna(a[1:]) & pd.isna(a[:-1])
                neq = neq & ~both_na
            change |= neq
        bounds = np.flatnonzero(change) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        vals = pdf[val_col].to_numpy(dtype="float64")
        for out_col, kernel in kernels.items():
            out = np.empty(n, dtype="float64")
            for s0, e0 in zip(starts, ends):
                out[s0:e0] = np.asarray(
                    kernel(pd.Series(vals[s0:e0])), dtype="float64"
                )
            pdf[out_col] = out
        yield pdf

    return part.mapInPandas(gen, schema=schema).select(*out_order)


def ema(
    df: DataFrame,
    n: int,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "ema",
    order_col: str = POS,
) -> DataFrame:
    """cs_window_ema (func.c:1764-1778): e_0 = x_0;
    e_i = p·x_i + (1-p)·e_{i-1}, p = 2/(n+1)."""
    return _recurrence_apply(
        df, partition_by, val_col, {out_col: _ema_kernel(n)}, order_col
    )


def _ema_kernel(n: int):
    p = 2.0 / (n + 1)

    def kernel(s: pd.Series) -> pd.Series:
        # pandas ewm(adjust=False) is exactly this recurrence.
        return s.astype("float64").ewm(alpha=p, adjust=False).mean()

    return kernel


def atr(
    df: DataFrame,
    n: int,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "atr",
    order_col: str = POS,
) -> DataFrame:
    """cs_window_atr (func.c:1779-1790): Wilder smoothing with warm-up:
    r_i = (r_{i-1}·(m-1) + x_i)/m where m = min(i+1, n)."""
    return _recurrence_apply(
        df, partition_by, val_col, {out_col: _atr_kernel(n)}, order_col
    )


def _atr_kernel(n: int):
    def kernel(s: pd.Series) -> pd.Series:
        import numpy as np

        x = s.astype("float64").to_numpy()
        out = np.empty_like(x)
        acc = 0.0
        for i in range(len(x)):
            m = min(i + 1, n)
            acc = (acc * (m - 1) + x[i]) / m
            out[i] = acc
        return pd.Series(out, index=s.index)

    return kernel


def recurrences(
    df: DataFrame,
    kernels: dict,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    order_col: str = POS,
) -> DataFrame:
    """Run several recurrences over the same series in one Arrow pass.
    kernels: {out_col: 'ema:N' | 'atr:N' | callable}."""
    resolved = {}
    for out_col, k in kernels.items():
        if callable(k):
            resolved[out_col] = k
        else:
            kind, _, num = k.partition(":")
            if kind not in ("ema", "atr"):
                # falling through to a default kernel would silently
                # compute ATR under a misspelled name
                raise ValueError(f"recurrences: unknown kernel spec {k!r}")
            n = int(num)
            resolved[out_col] = _ema_kernel(n) if kind == "ema" else _atr_kernel(n)
    return _recurrence_apply(df, partition_by, val_col, resolved, order_col)


# ---------------------------------------------------------------------------
# Scalable GLOBAL-series paths. A global Window.orderBy collapses to one
# partition; these two-phase formulations keep every stage parallel, the
# pattern the reference could not express (its fallback was running
# non-context-free ops single-threaded, imcs.c:1886-1908).
#
# Every scheme here runs TWO actions over the same bucketed frame (a
# carry/count/tail pass, then the apply pass). The bucket id is a
# deterministic pure function of pos (series.range_bucket_expr: literal
# range bounds probed once, balanced CASE tree), so both actions agree
# on bucketing with NOTHING persisted — the prior design froze a
# repartitionByRange via persist(), which leaked a corpus-scale cache
# entry per call and could not work where the series exceeds the
# storage pool. _range_by_pos centralizes that. For cum/moving the
# first action aggregates pruned input columns only (tiny); for the
# EWM/ATR split the carry pass needs each partition's LAST LOCAL
# recurrence value, so the Arrow recurrence itself runs twice — the
# deliberate trade of the no-persist rule (callers that will consume
# the result repeatedly can persist the OUTPUT under their own
# lifecycle).
# ---------------------------------------------------------------------------
def _range_by_pos(df: DataFrame, pos_col: str, num_partitions: int | None) -> DataFrame:
    """Tag the series frame with a deterministic range-bucket id
    ``_pid`` that every downstream job recomputes identically (local
    cumulate + per-partition totals never disagree on boundaries).
    Nothing is persisted; the totals pass prunes to the columns it
    aggregates. Small inputs (Catalyst size estimate) take a single
    constant bucket — the probe job is pure overhead where one task
    handles the series anyway."""
    from ..series import is_small_plan, range_bucket_expr

    if is_small_plan(df):
        return df.withColumn("_pid", F.lit(0))
    pid_expr, _n = range_bucket_expr(df, [pos_col], num_partitions)
    return df.withColumn("_pid", pid_expr)


def cum_agg_global(
    df: DataFrame,
    agg: str,
    val_col: str = VAL,
    out_col: str | None = None,
    pos_col: str = POS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cumulative aggregate over ONE giant series without a global
    window: range-partition by pos, cumulate within partitions (window
    partitioned by physical partition id — parallel), then combine the
    tiny per-partition totals on the driver into carry-in offsets and
    broadcast them back. Supported: sum, count, min, max, avg, var, dev
    (var/dev carry (Σx, Σx², n) — reference cs_cum_var/dev semantics,
    func.c:1791-1897, population variance), prd (sign-aware log-space
    carry, see _cum_prd_global). Exact, two jobs, no single-node
    stage.

    Numerical note: the var/dev carry is the textbook (Σx, Σx², n)
    form — additive across partitions, which is what makes the carry
    O(1) — at the cost of cancellation when |mean| ≫ stddev (relative
    error ≈ n·mean²·ε/var; at double precision this needs mean/stddev
    ratios beyond ~10⁶ at n=10⁹ before the first digit moves). Shift
    the value column by any constant near the mean before calling if
    the series lives that far from zero — variance is shift-invariant,
    the reference's own cs_cum_var accumulates the same raw moments
    (func.c:1791-1897)."""
    if agg not in ("sum", "count", "min", "max", "avg", "var", "dev", "prd"):
        raise ValueError(f"cum_agg_global: unsupported agg {agg!r}")
    out_name = out_col or f"cum_{agg}"
    spark = df.sparkSession
    if agg == "prd":
        return _cum_prd_global(df, val_col, out_name, pos_col, num_partitions)
    # dtype-aware carries: routing long min/max/sum carries through
    # float() + a double schema silently corrupted values past 2^53
    # (snowflake ids, nanosecond epochs) AND changed the output dtype
    # vs the plain cum_agg variants. Integral inputs keep exact long
    # carries; Σx² stays double (var/dev are double-valued anyway).
    from pyspark.sql import types as T

    _vdt = df.schema[val_col].dataType
    _integral = isinstance(
        _vdt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    _numeric = _integral or isinstance(_vdt, (T.FloatType, T.DoubleType))
    if agg in ("sum", "avg", "var", "dev") and not _numeric:
        # DecimalType would silently round-trip through float (digits
        # past 2^53 corrupt — the exact failure the integral branch
        # exists to prevent); other non-numeric types would TypeError
        # deep in the carry fold. Fail at the API instead.
        raise ValueError(
            f"cum_agg_global: agg {agg!r} needs an integral or float "
            f"value column, got {_vdt.simpleString()} — cast explicitly "
            "(Decimal callers choose their precision trade) or use "
            "cum_agg"
        )
    _vt = "long" if _integral else "double"
    _num = (lambda x: None if x is None else int(x)) if _integral else (
        lambda x: None if x is None else float(x)
    )
    # min/max carries travel in the VALUE's own type, passed through
    # verbatim: float() on a timestamp/string/decimal carry either
    # crashes or silently corrupts, and Python min()/max() + Spark
    # least()/greatest() order all of these natively
    _mm_t = _vdt.simpleString()
    pid = _range_by_pos(df, pos_col, num_partitions)
    w = Window.partitionBy("_pid").orderBy(pos_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = F.col(val_col)
    c2 = c.cast("double") * c.cast("double")
    # compute ONLY the running columns the requested agg reads — the
    # old code evaluated all five local windows and all five totals for
    # every call (Σx² multiplies for a cum_min, etc.)
    need_s = agg in ("sum", "avg", "var", "dev")
    need_s2 = agg in ("var", "dev")
    need_n = agg in ("sum", "count", "avg", "var", "dev")
    local = pid
    tot_aggs = []
    if need_s:
        local = local.withColumn("_ls", F.sum(c).over(w))
        tot_aggs.append(F.sum(c).alias("_s"))
    if need_s2:
        local = local.withColumn("_ls2", F.sum(c2).over(w))
        tot_aggs.append(F.sum(c2).alias("_s2"))
    if need_n:
        local = local.withColumn("_ln", F.count(c).over(w))
        tot_aggs.append(F.count(c).alias("_n"))
    if agg == "min":
        local = local.withColumn("_lmin", F.min(c).over(w))
        tot_aggs.append(F.min(c).alias("_mn"))
    if agg == "max":
        local = local.withColumn("_lmax", F.max(c).over(w))
        tot_aggs.append(F.max(c).alias("_mx"))
    totals = pid.groupBy("_pid").agg(*tot_aggs).orderBy("_pid").collect()
    s_zero = 0 if _integral else 0.0
    carry_rows, s_acc, s2_acc, n_acc, mn_acc, mx_acc = [], s_zero, 0.0, 0, None, None

    def _usable(x):
        return x is not None and not (isinstance(x, float) and x != x)

    for r in totals:
        d = r.asDict()
        carry_rows.append((r["_pid"], s_acc, s2_acc, n_acc, mn_acc, mx_acc))
        s_acc += d.get("_s") or s_zero
        s2_acc += d.get("_s2") or 0
        n_acc += d.get("_n") or 0
        # a partition whose values are all NULL reports _mn/_mx = None —
        # skip it (min(float, None) would throw). NaN needs Spark's
        # ordering (NaN sorts LARGEST), which Python min/max get wrong
        # order-dependently (min(nan, 5.0) is nan but min(5.0, nan) is
        # 5.0): window MIN therefore SKIPS NaN whenever a real value
        # exists — drop NaN partition minima from the fold — while
        # window MAX PROPAGATES it — a NaN partition maximum makes the
        # carry sticky-NaN
        if _usable(d.get("_mn")):
            # a NaN mn_acc is displaced by any real value (Spark sorts
            # NaN largest; Python min(NaN, x) would sticky-NaN instead)
            mn_acc = (
                d["_mn"] if (mn_acc is None or not _usable(mn_acc))
                else min(mn_acc, d["_mn"])
            )
        elif d.get("_mn") is not None and mn_acc is None:
            # a partition whose only values are NaN must still be
            # REMEMBERED: F.min returns NaN (not NULL) when only NaNs
            # exist, so a later row whose local prefix is all-NULL has
            # to see NaN, not NULL. NaN is displaced by any later real
            # value because least() treats NaN as largest.
            mn_acc = d["_mn"]
        _mx = d.get("_mx")
        if _mx is not None:
            if not _usable(_mx):
                mx_acc = _mx  # NaN: the largest value Spark knows
            elif mx_acc is None:
                mx_acc = _mx
            elif _usable(mx_acc):
                mx_acc = max(mx_acc, _mx)
            # else: mx_acc is already sticky-NaN
    carries = spark.createDataFrame(
        [
            (p, _num(s), float(s2), n, mn, mx)
            for p, s, s2, n, mn, mx in carry_rows
        ],
        f"_pid int, _cs {_vt}, _cs2 double, _cn long, _cmn {_mm_t}, _cmx {_mm_t}",
    )
    joined = local.join(F.broadcast(carries), "_pid")
    # coalesce the LOCAL running sums to 0: a within-partition prefix of
    # all NULLs is a NULL window sum, which would poison `local + carry`
    # to NULL even when earlier partitions carried real values. The
    # null-until-first-value contract (matching the plain cum_agg
    # window) is restored via the tot_n == 0 guard.
    tot_s = (
        F.coalesce(F.col("_ls"), F.lit(s_zero)) + F.col("_cs") if need_s else None
    )
    tot_s2 = (
        F.coalesce(F.col("_ls2"), F.lit(0.0)) + F.col("_cs2") if need_s2 else None
    )
    tot_n = F.col("_ln") + F.col("_cn") if need_n else None
    null_d = F.lit(None).cast("double")
    if agg == "count":
        expr = tot_n
    elif agg == "sum":
        expr = F.when(tot_n == 0, F.lit(None).cast(_vt)).otherwise(tot_s)
    elif agg == "avg":
        expr = F.when(tot_n == 0, null_d).otherwise(tot_s / tot_n)
    elif agg == "min":
        expr = F.least(F.col("_lmin"), F.coalesce(F.col("_cmn"), F.col("_lmin")))
    elif agg == "max":
        expr = F.greatest(F.col("_lmax"), F.coalesce(F.col("_cmx"), F.col("_lmax")))
    else:  # var / dev
        var_expr = tot_s2 / tot_n - (tot_s / tot_n) * (tot_s / tot_n)
        clamped = F.greatest(var_expr, F.lit(0.0))
        expr = F.when(
            tot_n == 0, null_d
        ).otherwise(clamped if agg == "var" else F.sqrt(clamped))
    drop_cols = [
        x for x in
        ("_pid", "_ls", "_ls2", "_ln", "_lmin", "_lmax")
        if x in joined.columns
    ] + ["_cs", "_cs2", "_cn", "_cmn", "_cmx"]
    return joined.withColumn(out_name, expr).drop(*drop_cols)


def _cum_prd_global(
    df: DataFrame,
    val_col: str,
    out_name: str,
    pos_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """cs_cum_prd over ONE giant series: the product state is
    (Σ log|x| over nonzeros, #zeros, #negatives) — all additive, so the
    same partition-carry scheme as cum_sum applies: cumulate the three
    counters within range partitions, prefix-sum the per-partition
    totals on the driver (P values), broadcast back. A zero anywhere in
    the prefix pins the product at 0 from there on; the sign is parity
    of the negative count."""
    spark = df.sparkSession
    pid = _range_by_pos(df, pos_col, num_partitions)
    w = Window.partitionBy("_pid").orderBy(pos_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = F.col(val_col).cast("double")
    log_abs = F.log(F.abs(F.nullif(c, F.lit(0.0))))
    is_zero = F.when(c == 0, 1).otherwise(0)
    is_neg = F.when(c < 0, 1).otherwise(0)
    local = (
        pid.withColumn("_lls", F.coalesce(F.sum(log_abs).over(w), F.lit(0.0)))
        .withColumn("_lnz", F.sum(is_zero).over(w))
        .withColumn("_lnn", F.sum(is_neg).over(w))
        .withColumn("_lc", F.count(c).over(w))
    )
    totals = (
        pid.groupBy("_pid")
        .agg(
            F.coalesce(F.sum(log_abs), F.lit(0.0)).alias("_s"),
            F.sum(is_zero).alias("_z"),
            F.sum(is_neg).alias("_n"),
            F.count(c).alias("_c"),
        )
        .orderBy("_pid")
        .collect()
    )
    rows, s_acc, z_acc, n_acc, c_acc = [], 0.0, 0, 0, 0
    for r in totals:
        rows.append((r["_pid"], s_acc, z_acc, n_acc, c_acc))
        s_acc += r["_s"]
        z_acc += r["_z"]
        n_acc += r["_n"]
        c_acc += r["_c"]
    carries = spark.createDataFrame(
        rows, "_pid int, _cs double, _cz long, _cn long, _cc long"
    )
    joined = local.join(F.broadcast(carries), "_pid")
    tot_log = F.col("_lls") + F.col("_cs")
    tot_zero = F.col("_lnz") + F.col("_cz")
    tot_neg = F.col("_lnn") + F.col("_cn")
    tot_cnt = F.col("_lc") + F.col("_cc")
    sign = F.when(tot_neg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    # null-until-first-value, matching the plain cum window and the
    # sum/avg paths of cum_agg_global (an all-NULL prefix used to
    # return exp(0) = 1.0 through the coalesced log sum)
    expr = (
        F.when(tot_cnt == 0, F.lit(None).cast("double"))
        .when(tot_zero > 0, F.lit(0.0))
        .otherwise(sign * F.exp(tot_log))
    )
    return joined.withColumn(out_name, expr).drop(
        "_pid", "_lls", "_lnz", "_lnn", "_lc", "_cs", "_cz", "_cn", "_cc"
    )


def moving_agg_global(
    df: DataFrame,
    agg: str,
    n: int,
    val_col: str = VAL,
    out_col: str | None = None,
    pos_col: str = POS,
    num_partitions: int | None = None,
    warmup: str = "partial",
) -> DataFrame:
    """Moving-window aggregate over ONE giant series without a global
    window: range-partition by pos; interior rows use a per-physical-
    partition window (parallel); only each partition's first n-1 rows
    need boundary context. That context is the *cumulative* tail — the
    last n-1 rows of ALL preceding partitions combined (any needed row
    is within the last n-1 rows of whichever partition holds it, so the
    union of per-partition tails suffices even when some partitions
    hold fewer than n-1 rows or are empty). Per-partition tails
    (≤ P×(n-1) rows — driver memory is bounded by partitions×window,
    the same order as the broadcast itself) are collected, chained into
    cumulative tails on the driver, and broadcast back. Exact for
    sum/avg/min/max/count/var/dev for values within double's exact
    integer range (|v| < 2^53): the head-row recombination folds
    through doubles, and the output column is double — use the plain
    per-series moving_agg when exact wider-than-53-bit long windows
    matter (cum_agg_global, by contrast, carries integral types
    exactly).

    warmup='reference' reproduces the C engine's zero-padded history
    for the first n-1 rows of the WHOLE series (see moving_agg) —
    only the head-row recombination changes: an assembled window
    shorter than n is padded with zeros. Interior rows always have
    full n-row windows, where both modes coincide (avg over n rows is
    sum/n; var_pop is the same raw-moment formula)."""
    if agg not in ("sum", "avg", "min", "max", "count", "var", "dev"):
        raise ValueError(f"moving_agg_global: unsupported agg {agg!r}")
    if warmup not in ("partial", "reference"):
        raise ValueError(f"moving_agg_global: unknown warmup mode {warmup!r}")
    out_name = out_col or f"window_{agg}"
    spark = df.sparkSession
    pid = _range_by_pos(df, pos_col, num_partitions)
    w = Window.partitionBy("_pid").orderBy(pos_col)
    wn = w.rowsBetween(-(n - 1), 0)
    fn = _MOVING[agg]
    local = pid.withColumn("_local", fn(F.col(val_col)).over(wn)).withColumn(
        "_lrn", F.row_number().over(w) - 1
    )
    # per-partition tails: last ≤ n-1 (pos, val) rows of each partition
    wdesc = Window.partitionBy("_pid").orderBy(F.col(pos_col).desc())
    tail_rows = (
        pid.withColumn("_rrn", F.row_number().over(wdesc))
        .filter(F.col("_rrn") <= n - 1)
        .select("_pid", F.col(pos_col).alias("p"), F.col(val_col).cast("double").alias("v"))
        .collect()
    )
    by_pid: dict[int, list] = {}
    for r in tail_rows:
        by_pid.setdefault(r["_pid"], []).append((r["p"], r["v"]))
    # cumulative tail entering partition j = last n-1 rows of the chain
    # of all preceding partitions' tails (ordered by pos)
    max_pid = max(by_pid) if by_pid else -1
    ctails, chain = [], []
    for j in range(max_pid + 2):
        if chain:
            ctails.append((j, list(chain[-(n - 1):] if n > 1 else [])))
        part_tail = sorted(by_pid.get(j, []))
        chain.extend(part_tail)
        chain = chain[-(n - 1):] if n > 1 else []
    if ctails:
        ctail_df = spark.createDataFrame(
            ctails, "_pid int, _tail array<struct<p: long, v: double>>"
        )
    else:
        ctail_df = spark.createDataFrame([], "_pid int, _tail array<struct<p: long, v: double>>")
    head = local.filter(F.col("_lrn") < n - 1).join(
        F.broadcast(ctail_df), "_pid", "left"
    )
    # needed = last (n-1-_lrn) of the cumulative tail; combine with own rows
    own_prefix = F.array_sort(
        F.collect_list(
            F.struct(F.col(pos_col).alias("p"), F.col(val_col).cast("double").alias("v"))
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    take = n - 1 - F.col("_lrn")
    prev_part = F.when(
        F.col("_tail").isNull(), F.array().cast("array<struct<p:bigint,v:double>>")
    ).otherwise(
        F.slice(
            F.col("_tail"),
            F.greatest(F.size("_tail") - take + 1, F.lit(1)).cast("int"),
            F.least(take, F.size("_tail")).cast("int"),
        )
    )
    head = head.withColumn("_win", F.concat(prev_part, own_prefix))
    # drop NULL values before aggregating — the collected structs keep
    # v = NULL entries, which would poison the fold to NULL and inflate
    # size(); interior rows use null-skipping window functions, and
    # head rows of the same series must agree with them
    vals = F.filter(
        F.transform(F.col("_win"), lambda s: s["v"]), lambda x: x.isNotNull()
    )
    _sum = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    _sum2 = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x * x)
    _cnt = F.size(vals)
    _null_d = F.lit(None).cast("double")
    _var = F.greatest(_sum2 / _cnt - (_sum / _cnt) * (_sum / _cnt), F.lit(0.0))
    _empty = _cnt == 0  # all-NULL window -> NULL, like F.sum(...).over
    if warmup == "reference":
        # zero-padded history: the divisor is always n and a window
        # shorter than n contains zeros (func.c:1632-1763). _win size
        # (not the null-filtered count) detects underfull windows —
        # reference series carry no NULLs.
        _under = F.size(F.col("_win")) < n
        _rvar = (_sum2 - _sum * _sum / n) / n
        combined = {
            "sum": F.when(_empty, _null_d).otherwise(_sum),
            "count": _cnt.cast("long"),
            "min": F.when(_under, F.least(F.array_min(vals), F.lit(0.0))).otherwise(F.array_min(vals)),
            "max": F.when(_under, F.greatest(F.array_max(vals), F.lit(0.0))).otherwise(F.array_max(vals)),
            "avg": F.when(_empty, _null_d).otherwise(_sum / n),
            "var": F.when(_empty, _null_d).otherwise(_rvar),
            "dev": F.when(_empty, _null_d).otherwise(F.sqrt(_rvar)),
        }[agg]
    else:
        combined = {
            "sum": F.when(_empty, _null_d).otherwise(_sum),
            "count": _cnt.cast("long"),
            "min": F.array_min(vals),
            "max": F.array_max(vals),
            "avg": F.when(_empty, _null_d).otherwise(_sum / _cnt),
            "var": F.when(_empty, _null_d).otherwise(_var),
            "dev": F.when(_empty, _null_d).otherwise(F.sqrt(_var)),
        }[agg]
    head_fixed = head.withColumn("_local", combined).drop("_tail", "_win")
    interior = local.filter(F.col("_lrn") >= n - 1)
    out = interior.unionByName(head_fixed).withColumnRenamed("_local", out_name)
    return out.drop("_pid", "_lrn")


def _ewm_global(
    df: DataFrame,
    alpha: float,
    val_col: str,
    out_col: str,
    pos_col: str,
    num_partitions: int | None,
    carry0: float | None = None,
) -> DataFrame:
    """EWM e_i = (1-α)·e_{i-1} + α·x_i over ONE giant DENSE series in a
    single distributed pass (r13; guide §1.2 — fix the algorithm before
    the per-task work).

    Exponential forgetting makes the recurrence local: a restart K rows
    back differs from the true value by a^K·(carry − x_restart), so with
    K sized for a^K ≤ 1e-20 the restarted value and the true value are
    the same double (double has ~2.2e-16 relative precision; the 1e-20
    headroom absorbs pathological |carry − x| ratios). Each of P
    position buckets therefore reads its own rows PLUS the K preceding
    rows (an overlap prefix duplicated from the previous bucket — K·P
    extra rows total, trivia against N), runs one pandas ewm per bucket,
    and emits only its own rows.

    The previous shape (local restart per bucket + exact a^(k+1) carry
    correction folded on the driver) needed TWO full passes over the
    series — one to collect per-bucket stats, one to apply corrections —
    plus an Exchange+Sort+Window to label rows. Measured on the 60M
    single-series soak this one-pass form is ~2x cheaper end to end; the
    carry0 seed (ATR warm-up) is applied exactly in-kernel to bucket 0,
    whose restart is the true series start.

    PRECONDITIONS (both verified, lazily, inside the kernel):
    - pos is DENSE (consecutive integers): buckets and prefixes are
      pure position arithmetic from one (min, count) probe; a gap makes
      the prefix shorter than K and the decay bound void, so any
      non-contiguous bucket raises instead of returning approximations.
    - values are non-NULL/non-NaN: pandas ewm(adjust=False)
      renormalizes its weights around NaN gaps and that semantics does
      not split across restarts — same guard the carry design had.

    alpha ≤ ~4e-4 (K ≥ bucket width) lowers P so buckets stay wider
    than the prefix — correctness never depends on P.
    """
    import math

    a = 1.0 - alpha
    # a^K ≤ 1e-20  →  K ≥ 46.1 / −ln a  (+ margin); alpha=1 needs none
    K = 0 if a <= 0.0 else int(math.ceil(46.1 / -math.log(a))) + 16

    spark = df.sparkSession
    probe = df.agg(
        F.min(pos_col).alias("_lo"),
        F.count(F.lit(1)).alias("_n"),
        F.max(pos_col).alias("_hi"),
    ).collect()[0]
    lo, n_rows, hi = probe["_lo"], probe["_n"], probe["_hi"]
    if lo is None:
        lo = 0  # empty input: bucket math degenerates harmlessly
    if n_rows and (hi - lo + 1) != n_rows:
        raise ValueError(
            "ema_global/atr_global require a dense series: pos spans "
            f"[{lo}, {hi}] but only {n_rows} rows exist — fill the gaps "
            "or use the per-series ema()/atr() path"
        )
    # scale-adaptive bucket count: cluster parallelism, not a constant
    # (the range_bucket probe this replaces sampled to ~half the core
    # count on the 60M soak, idling half the machine in the ewm stage)
    p_req = num_partitions or spark.sparkContext.defaultParallelism
    # keep every bucket wider than its prefix so a prefix never spans
    # two buckets (the decay argument needs K contiguous rows from the
    # immediately preceding bucket only)
    n_buckets = max(1, min(p_req, (n_rows or 1) // max(2 * K, 1)) or 1)
    width = -(-max(n_rows or 1, 1) // n_buckets)  # ceil

    off = F.col(pos_col) - F.lit(lo)
    body = df.withColumn("_pid", (off / F.lit(width)).cast("int"))
    if n_buckets > 1 and K > 0:
        pre = (
            df.where(
                (off % F.lit(width) >= F.lit(width - K))
                & ((off / F.lit(width)).cast("int") < F.lit(n_buckets - 1))
            )
            .withColumn("_pid", (off / F.lit(width)).cast("int") + F.lit(1))
        )
        tagged = body.unionByName(pre)
    else:
        tagged = body
    part = tagged.repartition("_pid").sortWithinPartitions("_pid", pos_col)

    # withColumn semantics: a replaced out_col keeps its ORIGINAL
    # position (overwritten in place as double); a new one appends.
    out_order = df.columns + ([out_col] if out_col not in df.columns else [])
    schema = ", ".join(
        [
            f"{f.name} {'double' if f.name == out_col else f.dataType.simpleString()}"
            for f in body.schema.fields
        ]
        + ([f"{out_col} double"] if out_col not in df.columns else [])
    )
    _lo, _width, _K, _c0, _alpha = lo, width, K, carry0, alpha

    def gen(batches):
        import numpy as np

        chunks = list(batches)
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0].reset_index(drop=True)
        )
        n = len(pdf)
        if n == 0:
            return
        pids = pdf["_pid"].to_numpy()
        poss = pdf[pos_col].to_numpy()
        vals = pdf[val_col].to_numpy(dtype="float64")
        out = np.empty(n, dtype="float64")
        keep = np.zeros(n, dtype=bool)
        change = pids[1:] != pids[:-1]
        bounds = np.flatnonzero(change) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        for s0, e0 in zip(starts, ends):
            v = vals[s0:e0]
            p = poss[s0:e0]
            if np.isnan(v).any():
                raise ValueError(
                    "ema_global/atr_global require a dense series: the "
                    "value column contains NULL/NaN rows — fill or drop "
                    "them first (the per-series ema()/atr() NaN "
                    "semantics is pandas ewm renormalization, which "
                    "cannot be split across restarts)"
                )
            if len(p) > 1 and not (np.diff(p) == 1).all():
                raise ValueError(
                    "ema_global/atr_global require a dense series: "
                    "non-consecutive pos inside a bucket (prefix/body "
                    "mismatch) — fill the gaps or use the per-series "
                    "ema()/atr() path"
                )
            e = pd.Series(v).ewm(alpha=_alpha, adjust=False).mean().to_numpy()
            pid0 = int(pids[s0])
            if pid0 == 0 and _c0 is not None:
                # exact closed-form seed: bucket 0's restart IS the
                # series start, so the carry0 correction is not an
                # approximation
                k = np.arange(1, e0 - s0 + 1, dtype="float64")
                e = e + ((1.0 - _alpha) ** k) * (_c0 - v[0])
            body_from = int(pid0) * _width + _lo  # first pos owned
            own = p >= body_from
            out[s0:e0] = e
            keep[s0:e0] = own
        pdf[out_col] = out
        yield pdf[keep]

    return (
        part.mapInPandas(gen, schema=schema).drop("_pid").select(*out_order)
    )


def ema_global(
    df: DataFrame,
    n: int,
    val_col: str = VAL,
    out_col: str = "ema",
    pos_col: str = POS,
    num_partitions: int | None = None,
) -> DataFrame:
    """EMA over ONE giant series without a sequential bottleneck —
    see _ewm_global. α = 2/(n+1), e_0 = x_0 (func.c:1764-1778)."""
    return _ewm_global(df, 2.0 / (n + 1), val_col, out_col, pos_col, num_partitions)


def atr_global(
    df: DataFrame,
    n: int,
    val_col: str = VAL,
    out_col: str = "atr",
    pos_col: str = POS,
    num_partitions: int | None = None,
) -> DataFrame:
    """ATR (Wilder smoothing, func.c:1779-1790) over ONE giant series.

    Post-warm-up (i ≥ n-1) the recurrence r_i = (r_{i-1}·(n-1) + x_i)/n
    is exactly the α = 1/n EWM, so it splits across partitions like EMA
    (_ewm_global). The warm-up region is only the first n-1 elements —
    bounded by the window parameter, not the data — and runs as one
    sequential pandas group; its final value seeds the split region's
    carry chain. Requires the dense-pos series convention."""
    if n <= 1:
        return df.withColumn(out_col, F.col(val_col).cast("double"))
    warm_src = df.filter(F.col(pos_col) < n - 1)
    rest_src = df.filter(F.col(pos_col) >= n - 1)
    # no persist: the warm region is bounded by the window parameter
    # (n-1 rows) and _recurrence_apply is deterministic, so the carry
    # probe and the final union may recompute it — cheaper than
    # leaking a cache entry per call
    warm = _recurrence_apply(
        warm_src, None, val_col, {out_col: _atr_kernel(n)}, pos_col
    )
    carry_row = warm.agg(F.max_by(out_col, pos_col).alias("_c")).collect()[0]
    carry = carry_row["_c"]
    if carry is None:
        # fewer than 1 warm row (empty input or series starts past n-1):
        # no warm-up contribution; treat the split region as a fresh EMA
        return _ewm_global(rest_src, 1.0 / n, val_col, out_col, pos_col, num_partitions)
    rest = _ewm_global(
        rest_src, 1.0 / n, val_col, out_col, pos_col, num_partitions, carry0=float(carry)
    )
    return warm.unionByName(rest.select(*warm.columns))
