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
    values are close but not identical. For the reference's exact
    register layout and estimator, see :func:`approxdc_hll128`."""
    return F.approx_count_distinct(_c(a), rsd)


def approxdc_hll128(df, a, by=None, out_col: str = "approxdc"):
    """The reference's own HLL, re-expressed declaratively
    (func.c:4802-4936): m=128 registers indexed by the TOP 7 bits of a
    32-bit hash, register value = trailing-zero count + 1 capped at 26,
    classic Flajolet estimator with the small-range (linear counting)
    and large-range (32-bit saturation) corrections, result truncated
    to an integer. The hash itself is the one necessary divergence:
    the reference uses murmur3_32(seed 0x5C1DB); here the HIGH 32 bits
    of xxhash64 (empirically the low 32 bits under-mix through XXH64's
    final avalanche — +20% systematic overestimate on sequential keys;
    the high word is clean: −5%…+2% across 10³–10⁵ cardinalities) —
    register statistics then match the random-hash distribution, so
    the estimator and its error bounds carry over exactly.

    Two hash aggregates: (by?, register) → max rank, then (by?) →
    the closed-form estimate. The shuffle carries at most 128 rows per
    group — the same mergeable-sketch shape as the reference's
    per-thread merge (imcs_approxdc_merge), so it scales to any
    corpus. Returns a DataFrame (by-keys + out_col)."""
    m = 128
    alpha_m = 0.7213 / (1 + 1.079 / m)
    pow_2_32 = float(0xFFFFFFFF)
    keys = list(by) if by else []
    h32 = F.shiftrightunsigned(F.xxhash64(_c(a)), 32)
    j = F.shiftrightunsigned(h32, 25).alias("_j")
    # trailing zeros via bit_count((h & -h) - 1); h=0 → 64, capped below
    tz = F.bit_count((h32.bitwiseAND(-h32)) - 1)
    rank = F.least(tz + 1, F.lit(26)).alias("_r")
    # NULLs don't count as a distinct value (xxhash64(NULL) returns the
    # seed hash, which would otherwise populate a register and add one
    # phantom distinct — diverging from approx_count_distinct and the
    # reference, whose aggregate iterator skips nulls)
    regs = (
        df.filter(_c(a).isNotNull())
        .select(*keys, j, rank)
        .groupBy(*keys, "_j")
        .agg(F.max("_r").alias("_mzb"))
    )
    # registers never touched by any row are 0 ⇒ contribute 2^-0 = 1
    # to the harmonic sum and count toward V (empty registers)
    n_seen = F.count(F.lit(1))
    c_sum = F.sum(F.pow(F.lit(2.0), -F.col("_mzb"))) + (m - n_seen)
    v_empty = (m - n_seen) + F.sum(F.when(F.col("_mzb") == 0, 1).otherwise(0))
    est = regs.groupBy(*keys).agg(
        (F.lit(alpha_m * m * m) / c_sum).alias("_e"), v_empty.alias("_v")
    )
    e = F.col("_e")
    small = (e <= 2.5 * m) & (F.col("_v") > 0)
    large = e > pow_2_32 / 30.0
    corrected = (
        F.when(small, m * F.log(F.lit(float(m)) / F.col("_v")))
        .when(large, -pow_2_32 * F.log(1 - e / pow_2_32))
        .otherwise(e)
    )
    return est.select(*keys, corrected.cast("long").alias(out_col))


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
