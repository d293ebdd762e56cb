"""Time-series special functions: diff, trend, cross, extrema, norm.

Reference: cs_diff func.c:2268-2304 (r[0]=0, r[i]=x[i]-x[i-1]);
cs_trend func.c:2305-2352 (sign of change vs previous element, carrying
the previous trend across plateaus); cs_cross func.c:4152-4220
(positions where the sequence crosses zero, with the reference's
zero-run position adjustment); cs_extrema func.c:4221-4307 (positions
of local extrema with plateau handling); cs_norm imcs.c:3145-3153
(divide by sqrt of sum of squares — two-pass).

All are window-function chains over the pos spine — JVM-side, parallel
across series. Only genuinely sequential state (none here — even the
trend carry is a "last non-null over preceding rows" window) would need
a pandas fallback.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..series import POS, VAL
from .positional import renumber


def _w(partition_by: Sequence[str] | None):
    if partition_by:
        return Window.partitionBy(*partition_by).orderBy(POS)
    return Window.orderBy(POS)


def diff(
    df: DataFrame,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "diff",
) -> DataFrame:
    """cs_diff: r[0] = 0 (reference yields 0 at pos 0, not null)."""
    w = _w(partition_by)
    c = F.col(val_col)
    return df.withColumn(out_col, F.coalesce(c - F.lag(c, 1).over(w), c - c))


def trend(
    df: DataFrame,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "trend",
) -> DataFrame:
    """cs_trend: -1/+1 on decrease/increase vs the previous element,
    previous trend carried across equal values; 0 until the first
    change (func.c:2305-2352)."""
    w = _w(partition_by)
    c = F.col(val_col)
    step = F.signum(c - F.lag(c, 1).over(w))  # null at pos 0
    carry = F.last(F.when(step != 0, step), ignorenulls=True).over(
        _w(partition_by).rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.coalesce(carry, F.lit(0.0)).cast("tinyint"))


def cross(
    df: DataFrame,
    direction: int = 0,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """cs_cross: positions where the series crosses zero.

    Reference algorithm (func.c:4152-4220): a crossing is a strict sign
    flip of the running sign (zeros don't flip; they accumulate a
    counter that is subtracted from the reported position and is reset
    whenever the running sign changes). With direction=±1 the first
    *reported* crossing must be into that sign; later crossings are
    unconditional.

    Output: series frame (pos, val=crossing position).
    """
    keys = [*partition_by] if partition_by else []
    wfull = _w(partition_by).rowsBetween(Window.unboundedPreceding, 0)
    wprev = _w(partition_by).rowsBetween(Window.unboundedPreceding, -1)
    s = F.signum(F.col(val_col))
    d = df.withColumn("_s", s)
    # running (last non-zero) sign before this row
    prev_nz = F.last(F.when(F.col("_s") != 0, F.col("_s")), ignorenulls=True).over(wprev)
    d = d.withColumn("_prev_nz", prev_nz)
    # sign-set event: non-zero value that changes the running sign
    d = d.withColumn(
        "_set",
        (F.col("_s") != 0)
        & (F.col("_prev_nz").isNull() | (F.col("_s") != F.col("_prev_nz"))),
    )
    # inclusive cumulative zero count
    d = d.withColumn("_z", F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).over(wfull))
    # zero count at the last sign-set event before this row
    z_at_set = F.last(F.when(F.col("_set"), F.col("_z")), ignorenulls=True).over(wprev)
    d = d.withColumn("_z_set", F.coalesce(z_at_set, F.lit(0)))
    crossing = F.col("_set") & F.col("_prev_nz").isNotNull()
    out = d.withColumn("_crossing", crossing).filter(F.col("_crossing")).withColumn(
        VAL + "_new", F.col(POS) - (F.col("_z") - F.col("_z_set"))
    )
    if direction:
        # drop crossings before the first one whose new sign == direction
        wmin = (
            Window.partitionBy(*keys) if keys else Window.partitionBy()
        )
        first_ok = F.min(F.when(F.col("_s") == direction, F.col(POS))).over(wmin)
        out = out.withColumn("_first_ok", first_ok).filter(
            F.col(POS) >= F.col("_first_ok")
        )
    out = out.select(*keys, F.col(VAL + "_new").cast("long").alias(VAL))
    return renumber(out, keys or None, order_by=(VAL,))


def extrema(
    df: DataFrame,
    first_extremum: int = 0,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """cs_extrema: positions of local extrema (func.c:4221-4307).

    A trend flip at element i reports position i-1 (so plateaus report
    their last element). first_extremum=+1 keeps only maxima (flips
    whose preceding trend was rising), -1 only minima, 0 all.

    Output: series frame (pos, val=extremum position).
    """
    keys = [*partition_by] if partition_by else []
    w = _w(partition_by)
    wprev = _w(partition_by).rowsBetween(Window.unboundedPreceding, -1)
    c = F.col(val_col)
    d = df.withColumn("_t", F.signum(c - F.lag(c, 1).over(w)))
    prev_nz = F.last(F.when(F.col("_t") != 0, F.col("_t")), ignorenulls=True).over(wprev)
    d = d.withColumn("_prev_t", prev_nz)
    flip = (
        (F.col("_t") != 0)
        & F.col("_prev_t").isNotNull()
        & (F.col("_t") != F.col("_prev_t"))
    )
    d = d.withColumn("_flip", flip)
    if first_extremum:
        d = d.filter(~F.col("_flip") | (F.col("_prev_t") == first_extremum))
    out = d.filter(F.col("_flip")).select(
        *keys, (F.col(POS) - 1).cast("long").alias(VAL)
    )
    return renumber(out, keys or None, order_by=(VAL,))


def norm(
    df: DataFrame,
    val_col: str = VAL,
    partition_by: Sequence[str] | None = None,
    out_col: str = "norm",
) -> DataFrame:
    """cs_norm: x / sqrt(Σx²) — the reference does two passes
    (imcs.c:3145-3153); Spark computes the total with an unpartitioned
    window aggregate (partial-aggregated, no sort)."""
    if partition_by:
        w = Window.partitionBy(*partition_by)
    else:
        w = Window.partitionBy()
    c = F.col(val_col)
    nrm = F.sqrt(F.sum(c * c).over(w))
    # all-zero series: C computes 0/0 = NaN (imcs.c:3145-3153); the
    # bare division raises DIVIDE_BY_ZERO under ANSI mode instead
    return df.withColumn(
        out_col,
        F.when(nrm == 0, F.lit(float("nan"))).otherwise(c / nrm),
    )
