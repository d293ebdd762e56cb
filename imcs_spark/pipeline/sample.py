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

Scale shapes: uniform/weighted top-n run as distributed
TakeOrderedAndProject (per-partition heaps, no full sort);
stratified is one shuffle on the stratum key + a per-group
row_number window. A stratum so hot it swamps one reducer is the
usual skew hazard — at that point sample per sub-salt and re-limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curate import hash48 as _hash_rank

_HASH_BITS = 48


def uniform_sample(df: DataFrame, key_col: str, n: int) -> DataFrame:
    """The n documents with the smallest key-hash rank — a fixed-size
    uniform sample, stable across runs/partitionings/engines. Ties are
    impossible short of an md5-prefix collision; the key itself breaks
    them deterministically anyway."""
    if n <= 0:
        raise ValueError(f"uniform_sample: n must be positive, got {n}")
    return (
        df.withColumn("_rk", _hash_rank(key_col))
        .orderBy("_rk", key_col)
        .limit(n)
        .drop("_rk")
    )


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
    df: DataFrame, key_col: str, weight_col: str | Column, n: int
) -> DataFrame:
    """Fixed-size sample with inclusion probability proportional to
    weight (Efraimidis-Spirakis A-Res): each document draws the
    deterministic uniform u = (hash48(key) + 0.5) / 2^48 and the n
    largest u^(1/w) win — equivalently the n largest ln(u)/w, which
    avoids underflow for large weights. Zero/negative/NULL weights
    never win (their sort key is -inf). The ordering key involves
    ln(), so cross-engine equality holds to libm precision — exact in
    practice for hash-derived u (ranks differ by ULPs only at
    astronomically improbable near-ties)."""
    if n <= 0:
        raise ValueError(f"weighted_sample: n must be positive, got {n}")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (_hash_rank(key_col).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << _HASH_BITS)
    )
    es = F.when(
        wcol.isNotNull() & (wcol > 0), F.log(u) / wcol.cast("double")
    ).otherwise(F.lit(float("-inf")))
    return (
        df.withColumn("_es", es)
        .orderBy(F.desc("_es"), key_col)
        .limit(n)
        .drop("_es")
    )
