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


# --- murmur3_32 in Column algebra (reference func.c:4806-4860) -----------
# The reference's HLL hashes raw value bytes with murmur3_32 seed
# 0x5C1DB. Re-deriving it JVM-side makes approxdc_hll128 estimates
# bit-identical to the C engine. Every intermediate stays a
# non-negative long < 2^48, so the chain is safe under
# spark.sql.ansi.enabled: the 32-bit modular multiply is split into
# 16-bit halves instead of relying on 64-bit wraparound.
MURMUR_SEED = 0x5C1DB
_M3_C1, _M3_C2 = 0xCC9E2D51, 0x1B873593
_MASK32 = 0xFFFFFFFF


def _mul32(a: Column, c: int) -> Column:
    """(a * c) mod 2^32 for 0 <= a < 2^32 without 64-bit overflow."""
    hi = (F.shiftrightunsigned(a, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF))
    lo = a.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    return (F.shiftleft(hi, 16) + lo).bitwiseAND(F.lit(_MASK32))


def _rotl32(x: Column, r: int) -> Column:
    return F.shiftleft(x, r).bitwiseAND(F.lit(_MASK32)).bitwiseOR(
        F.shiftrightunsigned(x, 32 - r)
    )


def _m3_mix(h1: Column, block: Column) -> Column:
    k1 = _mul32(_rotl32(_mul32(block, _M3_C1), 15), _M3_C2)
    h1 = _rotl32(h1.bitwiseXOR(k1), 13)
    return (h1 * 5 + F.lit(0xE6546B64)).bitwiseAND(F.lit(_MASK32))


def murmur3_32_long(x, seed: int = MURMUR_SEED) -> Column:
    """murmur3_32 of the 8-byte little-endian two's-complement
    representation of a 64-bit integer — bit-identical to the
    reference's murmur_hash3_32(&val, 8, seed) on little-endian
    hardware (func.c:4807-4860): two 4-byte blocks (low word then high
    word), no tail, len-xor 8, fmix32 avalanche.

    NOTE: this single-Column form duplicates each intermediate ~2x per
    step (the expression tree is ~2000 nodes) — correct, and fine for
    tests or one-off use, but in a per-row hot path use
    :func:`with_murmur3_32`, which materializes each step as its own
    projected attribute so every expression stays tiny and
    whole-stage-codegen'd (the single-tree form measured ~10x slower
    per row when it fell out of codegen)."""
    v = _c(x).cast("long")
    h1 = F.lit(seed)
    h1 = _m3_mix(h1, v.bitwiseAND(F.lit(_MASK32)))
    h1 = _m3_mix(h1, F.shiftrightunsigned(v, 32))
    h1 = h1.bitwiseXOR(F.lit(8))
    h1 = h1.bitwiseXOR(F.shiftrightunsigned(h1, 16))
    h1 = _mul32(h1, 0x85EBCA6B)
    h1 = h1.bitwiseXOR(F.shiftrightunsigned(h1, 13))
    h1 = _mul32(h1, 0xC2B2AE35)
    return h1.bitwiseXOR(F.shiftrightunsigned(h1, 16))


def with_murmur3_32(df, x, out_col: str, seed: int = MURMUR_SEED, keep=None):
    """Hot-path murmur3_32: the identical step chain as
    :func:`murmur3_32_long`, but each intermediate is its own projected
    column so every expression references only ATTRIBUTES (cheap to
    repeat) — the plan is a short chain of small Projects that Catalyst
    keeps codegen'd instead of one duplicated ~2000-node tree that
    falls back to interpreted eval. Returns df with `out_col` added and
    only ``keep`` (default: all original) columns retained."""
    keep = list(df.columns) if keep is None else list(keep)
    t = "_m3_t"  # scratch column, overwritten per step

    def step(d, expr):
        return d.withColumn(t, expr)

    v = _c(x).cast("long")
    d = df.withColumn("_m3_v", v)
    v = F.col("_m3_v")
    h = F.lit(seed)
    for blk in (v.bitwiseAND(F.lit(_MASK32)), F.shiftrightunsigned(v, 32)):
        d = step(d, blk)
        d = step(d, _mul32(F.col(t), _M3_C1))
        d = step(d, _rotl32(F.col(t), 15))
        d = step(d, _mul32(F.col(t), _M3_C2))
        d = d.withColumn("_m3_h", _rotl32(h.bitwiseXOR(F.col(t)), 13))
        d = d.withColumn(
            "_m3_h", (F.col("_m3_h") * 5 + F.lit(0xE6546B64)).bitwiseAND(F.lit(_MASK32))
        )
        h = F.col("_m3_h")
    d = d.withColumn("_m3_h", h.bitwiseXOR(F.lit(8)))
    d = d.withColumn("_m3_h", h.bitwiseXOR(F.shiftrightunsigned(h, 16)))
    d = step(d, _mul32(h, 0x85EBCA6B))
    d = d.withColumn("_m3_h", F.col(t).bitwiseXOR(F.shiftrightunsigned(F.col(t), 13)))
    d = step(d, _mul32(h, 0xC2B2AE35))
    d = d.withColumn("_m3_h", F.col(t).bitwiseXOR(F.shiftrightunsigned(F.col(t), 16)))
    return d.select(*keep, F.col("_m3_h").alias(out_col))


def approxdc_hll128(df, a, by=None, out_col: str = "approxdc", hash: str | None = None):
    """The reference's own HLL, re-expressed declaratively
    (func.c:4802-4936): m=128 registers indexed by the TOP 7 bits of a
    32-bit hash, register value = trailing-zero count + 1 capped at 26,
    classic Flajolet estimator with the small-range (linear counting)
    and large-range (32-bit saturation) corrections, result truncated
    to an integer. With the default ``hash='murmur3'`` the hash is the
    reference's own murmur3_32(seed 0x5C1DB) over the value's 8-byte
    integer representation, so estimates are bit-identical to the C
    engine for integer series (and re-derivable in any engine — the
    driver oracle recomputes them in DuckDB SQL). ``hash='xxhash64'``
    keeps the high-word-of-xxhash64 variant for non-integer types the
    byte-layout contract doesn't cover. The default (``hash=None``)
    dispatches by column type: murmur3 for integral columns, xxhash64
    otherwise — an unconditional murmur3 default silently collapsed
    fractional values through the long cast (2000 distinct halves →
    ~1000) and crashed on strings under ANSI casting. Passing
    ``hash='murmur3'`` explicitly on a non-integral column raises.

    Two hash aggregates: (by?, register) → max rank, then (by?) →
    the closed-form estimate. The shuffle carries at most 128 rows per
    group — the same mergeable-sketch shape as the reference's
    per-thread merge (imcs_approxdc_merge), so it scales to any
    corpus. Returns a DataFrame (by-keys + out_col)."""
    m = 128
    alpha_m = 0.7213 / (1 + 1.079 / m)
    pow_2_32 = float(0xFFFFFFFF)
    keys = list(by) if by else []
    # NULLs don't count as a distinct value (a hash of NULL would
    # otherwise populate a register and add one phantom distinct —
    # diverging from approx_count_distinct and the reference, whose
    # aggregate iterator skips nulls)
    base = df.filter(_c(a).isNotNull())
    from pyspark.sql import types as T

    dt = base.select(_c(a).alias("_x")).schema["_x"].dataType
    integral = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    if hash is None:
        hash = "murmur3" if integral else "xxhash64"
    elif hash == "murmur3" and not integral:
        raise TypeError(
            f"approxdc_hll128: hash='murmur3' requires an integral column "
            f"(the reference hashes the 8-byte integer representation); got "
            f"{dt.simpleString()} — use hash='xxhash64' or omit hash"
        )
    if hash == "murmur3":
        # stepwise-projected hash: every step stays a tiny codegen'd
        # expression (the single-tree Column form ran interpreted and
        # was ~10x slower per row)
        hashed = with_murmur3_32(base, a, "_h32", keep=keys)
    elif hash == "xxhash64":
        # high word: the low 32 bits under-mix through XXH64's final
        # avalanche (+20% systematic overestimate on sequential keys)
        hashed = base.select(
            *keys, F.shiftrightunsigned(F.xxhash64(_c(a)), 32).alias("_h32")
        )
    else:
        raise ValueError(f"approxdc_hll128: unknown hash {hash!r}")
    h32 = F.col("_h32")
    j = F.shiftrightunsigned(h32, 25).alias("_j")
    # trailing zeros via bit_count((h & -h) - 1); h=0 → 64, capped below
    tz = F.bit_count((h32.bitwiseAND(-h32)) - 1)
    rank = F.least(tz + 1, F.lit(26)).alias("_r")
    regs = (
        hashed.select(*keys, j, rank)
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
