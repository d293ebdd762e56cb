"""Grand aggregates — whole-series → scalar (cs_sum, cs_wavg, ...).

Reference: IMCS_AGG_DEF func.c:1353-1419 (sum/avg/max/min/prd/var/dev,
all/any), binary aggs IMCS_BIN_AGG_DEF func.c:1502-1631 (wsum/wavg/
corr/cov), median func.c:3601-3645, HLL approxdc func.c:4802-4936,
count func.c:6554-6593.

The reference parallelizes these by cloning the iterator tree per
thread and merging partial accumulators (imcs.c:2005-2035). Spark's
partial/final HashAggregate is the same model, for free — every
function here is a plain Column aggregate that Catalyst executes as a
two-phase parallel aggregation with no shuffle of raw data (only the
tiny partial states move).

Semantics notes:
- var/dev are *population* (formula (Σx²−(Σx)²/n)/n, func.c:1475-1501)
  → var_pop/stddev_pop, NOT Spark's default sample variance.
- wavg is Σ(weight·value)/Σ(weight)  (func.c:1560-1570: wsum/sum).
- prd (product) has no native Spark aggregate; implemented sign-aware
  via exp(Σ log|x|) with zero/negative handling.
- approxdc is HLL with m=128 in the reference; Spark's HLL++ differs in
  constants → assert tolerance in tests, not equality.
- all/any are *bitwise* AND/OR over integer series (func.c:1446-1457).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def count(a) -> Column:
    return F.count(_c(a))


def max(a) -> Column:  # noqa: A001
    return F.max(_c(a))


def min(a) -> Column:  # noqa: A001
    return F.min(_c(a))


def sum(a) -> Column:  # noqa: A001
    return F.sum(_c(a))


def avg(a) -> Column:
    return F.avg(_c(a))


def var(a) -> Column:
    """Population variance (func.c:1475-1485)."""
    return F.var_pop(_c(a))


def dev(a) -> Column:
    """Population stddev (func.c:1486-1501)."""
    return F.stddev_pop(_c(a))


def prd(a) -> Column:
    """Product aggregate (func.c:1458-1466). Sign-aware log-sum:
    0 if any zero; sign = parity of negative count."""
    c = _c(a)
    log_sum = F.sum(F.log(F.abs(c.cast("double"))))
    n_zero = F.sum(F.when(c == 0, 1).otherwise(0))
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0))
    sign = F.when(n_neg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * F.exp(log_sum))


def all_(a) -> Column:
    """Bitwise AND over the series (func.c:1446-1451)."""
    return F.bit_and(_c(a))


def any_(a) -> Column:
    """Bitwise OR over the series (func.c:1452-1457)."""
    return F.bit_or(_c(a))


def median(a) -> Column:
    """Exact median (reference sorts the materialized array,
    func.c:3601-3645). Spark's F.median is exact too."""
    return F.median(_c(a))


def approxdc(a, rsd: float = 0.05) -> Column:
    """Approximate distinct count. Reference: HLL m=128 murmur3
    (func.c:4802-4936, mergeable across threads). Spark: HLL++ —
    mergeable across partitions the same way; constants differ so
    values are close but not identical."""
    return F.approx_count_distinct(_c(a), rsd)


# --- binary grand aggregates (func.c:1502-1631) ---
def wsum(weight, value) -> Column:
    """Σ w·v (op `+*`)."""
    return F.sum(_c(weight) * _c(value))


def wavg(weight, value) -> Column:
    """Σ w·v / Σ w (op `//`) — the reference's VWAP primitive."""
    return F.sum(_c(weight) * _c(value)) / F.sum(_c(weight))


def corr(a, b) -> Column:
    return F.corr(_c(a), _c(b))


def cov(a, b) -> Column:
    """Population covariance (func.c:1602-1615: Σab/n − mean_a·mean_b)."""
    return F.covar_pop(_c(a), _c(b))
