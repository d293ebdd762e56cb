"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample) is irreproducible across runs, partition
layouts, and engines; curation pipelines need samples that are (a)
stable under corpus growth — adding documents never evicts an
already-selected one except by displacement at the size boundary —
and (b) recomputable by an independent engine for audit. Every
operator here orders by a hash of a stable business key, so the
"random" order is a pure function of the data:

- uniform_sample:   n smallest md5(key) — a deterministic equivalent
                    of reservoir sampling (each key's rank is an
                    i.i.d. uniform draw frozen at its hash).
- stratified_sample: the same rule per stratum, exact n per group.
- weighted_sample:  Efraimidis-Spirakis A-Res with the uniform draw
                    derived from the key hash: select the n largest
                    u^(1/w) — inclusion probability proportional to
                    weight, deterministic given (keys, weights).

Scale shapes: for modest n, uniform/weighted top-n run as distributed
TakeOrderedAndProject (per-partition heaps, no full sort) — but that
operator's FINAL merge funnels min(n, partition) rows from every
partition through one point, which breaks down for a training-data-
scale draw (n in the millions from 10^11 rows). Above
``topn_merge_max`` the selection switches to a RANK-THRESHOLD CUT:
approx-quantile the hash rank at n/N with error eps, keep everything
strictly below the lower cutoff with NO sort at all (the guaranteed-in
body), and run the top-k merge only over the O(eps*N) boundary stratum
between the cutoffs — exact same n rows, deterministic, still
recomputable by the audit oracle, no structure anywhere proportional
to n on a single task. Stratified is one shuffle on the stratum key +
a per-group row_number window; a stratum so hot it swamps one reducer
is the usual skew hazard — at that point sample per sub-salt and
re-limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curate import hash48 as _hash_rank

_HASH_BITS = 48

# Above this n, orderBy().limit(n)'s single final merge (P×n rows
# through one task) costs more than the rank-threshold cut's three
# extra passes. 64k rows × ~dozens of partitions is comfortably inside
# one task's memory; millions are not.
TOPN_MERGE_MAX = 65536


def _threshold_select(
    df: DataFrame, order_col: str, key_col: str, n: int, n_total: int
) -> DataFrame:
    """Exactly the n smallest rows by (order_col, key_col) without a
    global single-point top-n merge. approxQuantile's rank guarantee
    (returned value's exact rank within eps*N of the requested one)
    splits the corpus into:

      body      order < c_lo          rank(c_lo) < n  -> all kept, NO sort
      boundary  c_lo <= order <= c_hi rank(c_hi) >= n -> small top-k
      rest      order > c_hi          can never be in the sample

    The boundary holds O(eps*N) = O(min(1e-3*N, 0.05*n)) rows — a
    fixed 0.1%-of-corpus cap once n is large enough for it to bind,
    otherwise ~5-15% of n: a ~7x reduction of the single-point merge,
    not an absolute O(1) bound, but never proportional to N for large
    draws. The only TakeOrderedAndProject left runs at that size.
    Ties across the cutoff are a non-issue for 48-bit hash ranks (and
    the deterministic key breaks any that occur inside the boundary
    sort).

    NULL order values sort FIRST in Spark's ascending orderBy, so the
    small-n path selects them first; to agree exactly, the body filter
    treats NULL as below every cutoff (comparison predicates alone
    would evaluate null -> false and silently drop such rows, and
    approxQuantile ignores nulls)."""
    if n >= n_total:
        return df
    q = n / n_total
    eps = max(1e-6, min(1e-3, 0.05 * q))
    c_lo, c_hi = df.stat.approxQuantile(
        order_col, [max(0.0, q - 2 * eps), min(1.0, q + 2 * eps)], eps
    )
    below = df.filter(F.col(order_col).isNull() | (F.col(order_col) < c_lo))
    n_below = below.count()
    if n_below > n:
        # cannot happen under the rank guarantee; belt-and-braces
        # fallback to the plain top-n rather than returning wrong rows
        return df.orderBy(order_col, key_col).limit(n)
    boundary = df.filter(
        (F.col(order_col) >= c_lo) & (F.col(order_col) <= c_hi)
    )
    take = boundary.orderBy(order_col, key_col).limit(n - n_below)
    return below.unionByName(take)


def uniform_sample(
    df: DataFrame, key_col: str, n: int, topn_merge_max: int = TOPN_MERGE_MAX
) -> DataFrame:
    """The n documents with the smallest key-hash rank — a fixed-size
    uniform sample, stable across runs/partitionings/engines. Ties are
    impossible short of an md5-prefix collision; the key itself breaks
    them deterministically anyway. n above ``topn_merge_max`` selects
    by rank-threshold cut instead of a global top-n merge (same rows,
    see module docstring)."""
    if n <= 0:
        raise ValueError(f"uniform_sample: n must be positive, got {n}")
    ranked = df.withColumn("_rk", _hash_rank(key_col))
    if n > topn_merge_max:
        return _threshold_select(ranked, "_rk", key_col, n, df.count()).drop("_rk")
    return ranked.orderBy("_rk", key_col).limit(n).drop("_rk")


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, stratum size) documents per stratum, chosen by
    the same hash order as uniform_sample — equal representation of
    every stratum regardless of its share of the corpus (the property
    proportional sampling lacks for rare sources/languages)."""
    if n_per_stratum <= 0:
        raise ValueError(
            f"stratified_sample: n_per_stratum must be positive, got {n_per_stratum}"
        )
    w = Window.partitionBy(strata_col).orderBy(F.col("_rk"), F.col(key_col))
    return (
        df.withColumn("_rk", _hash_rank(key_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rk", "_rn")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    n: int,
    topn_merge_max: int = TOPN_MERGE_MAX,
) -> DataFrame:
    """Fixed-size sample with inclusion probability proportional to
    weight (Efraimidis-Spirakis A-Res): each document draws the
    deterministic uniform u = (hash48(key) + 0.5) / 2^48 and the n
    largest u^(1/w) win — equivalently the n largest ln(u)/w, which
    avoids underflow for large weights. Zero/negative/NULL weights
    never win (their sort key is -inf; they appear only when n exceeds
    the eligible population). The ordering key involves
    ln(), so cross-engine equality holds to libm precision — exact in
    practice for hash-derived u (ranks differ by ULPs only at
    astronomically improbable near-ties).

    n above ``topn_merge_max`` selects by rank-threshold cut on the
    NEGATED A-Res key (same rows as the top-n, no global single-point
    merge — module docstring). The cut restricts itself to eligible
    (positive finite weight) rows; in the degenerate case n >= eligible
    population it falls back to the plain top-n (the caller is taking
    essentially everything)."""
    if n <= 0:
        raise ValueError(f"weighted_sample: n must be positive, got {n}")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (_hash_rank(key_col).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << _HASH_BITS)
    )
    es = F.when(
        wcol.isNotNull() & (wcol > 0), F.log(u) / wcol.cast("double")
    ).otherwise(F.lit(float("-inf")))
    ranked = df.withColumn("_es", es)
    if n > topn_merge_max:
        # largest _es == smallest -_es; ineligible rows (-inf -> +inf
        # after negation) are excluded from the cut — they can only
        # matter when n >= the eligible count, the fallback case
        eligible = ranked.filter(F.col("_es") != F.lit(float("-inf"))).withColumn(
            "_nes", -F.col("_es")
        )
        n_eligible = eligible.count()
        if n < n_eligible:
            return _threshold_select(eligible, "_nes", key_col, n, n_eligible).drop(
                "_es", "_nes"
            )
    return ranked.orderBy(F.desc("_es"), key_col).limit(n).drop("_es")
