"""Corpus curation beyond dedup: decontamination, repetition metrics,
deterministic splits, and training-sequence packing.

These are the operations a large-scale training-data pipeline runs
after filtering/dedup and before tokenization, designed Spark-first:

- decontamination: membership of any document n-gram in a benchmark
  n-gram set — an equi-join on hashed grams. The benchmark side is
  tiny (eval suites), so it broadcasts; the corpus is never shuffled.
- repetition metrics: within-document duplicate n-gram ratios (the
  Gopher repetition filters). explode + two-level aggregation; gram
  counts partially aggregate map-side, so the shuffle carries one row
  per distinct (doc, gram) — bounded by document length, not corpus.
- deterministic split: md5-based hash bucketing of a stable key. No
  randomness, no coordination: any worker anywhere assigns the same
  document to the same split, so train/val/test membership is
  reproducible across runs, clusters, and engines (md5 is bit-stable
  everywhere, unlike seeded RNG sampling).
- sequence packing: assign documents to fixed-token-budget training
  sequences by cumulative token count within each source stream — a
  prefix-sum window per source partition, fully parallel across
  sources; the greedy "next sequence when the budget would overflow"
  rule is expressible as floor(cum_before / budget) when documents are
  concatenated back-to-back (the standard packed-pretraining layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: a document is contaminated when it
    shares ANY word n-gram with the benchmark corpus (the n-gram
    membership test used to scrub eval sets out of pretraining data;
    n=8..13 is the common window). Gram sets are compared by 64-bit
    hash — no gram strings move; the benchmark gram set is distinct-ed
    and broadcast, the corpus side is a narrow explode + semi-join, so
    the corpus never shuffles.

    mode='flag'  → original rows + boolean `contaminated`
    mode='drop'  → only clean rows (anti-join)
    """
    bench_grams = (
        shingle_hashes(benchmark.select(text_col), text_col, n)
        .select("shingle")
        .distinct()
    )
    doc_grams = shingle_hashes(docs.select(id_col, text_col), text_col, n).select(
        id_col, "shingle"
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return docs.join(hits, id_col, "left_anti")
    return docs.join(
        hits.withColumn("contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def repetition_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition metrics over word n-grams (Gopher-style
    repetition filters):

    - dup_gram_frac: fraction of n-gram OCCURRENCES that are repeats
      of an earlier occurrence ((total − distinct) / total);
    - top_gram_frac: fraction of occurrences taken by the single most
      frequent n-gram.

    explode → count per (doc, gram) → per-doc aggregate. Both shuffles
    carry partially-aggregated counts keyed by doc (plus gram for the
    first), so traffic is bounded by distinct grams per doc."""
    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    size = F.size(toks)
    # n-grams via aligned shifted slices + zip_with (per-index slice
    # lambdas fall out of codegen into interpreted eval); null padding
    # from zip_with marks past-the-end positions and concat propagates
    # it, so they drop in the filter. Docs shorter than n contribute
    # their whole token stream as one gram (inclusive-slice truncation
    # semantics, matching the DuckDB oracle's ws[i:i+n-1]).
    grams = toks
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, size),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(size >= n, F.filter(grams, lambda g: g.isNotNull())).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    per_gram = (
        docs.select(id_col, F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return per_gram.groupBy(id_col).agg(
        ((F.sum("_c") - F.count(F.lit(1))) / F.sum("_c")).alias("dup_gram_frac"),
        (F.max("_c") / F.sum("_c")).alias("top_gram_frac"),
        F.sum("_c").alias("n_grams"),
    )


def split_bucket(key_col: str | Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the key —
    stable across engines (the first 12 hex digits of md5, i.e. 48
    bits, modulo `buckets`; the old 16-bit prefix silently broke past
    65,536 buckets and skewed badly approaching it). Use a stable
    business key (id, URL), never a row position."""
    if not 0 < buckets <= 1 << 32:
        raise ValueError(f"split_bucket: buckets must be in (0, 2^32], got {buckets}")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("long")
    return (h % buckets).cast("int")


def dataset_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by deterministic hash bucket. weights are
    integer percentages summing to 100; document membership depends
    only on the key, so adding/removing rows never reshuffles others
    (the property random sampling lacks)."""
    assert sum(weights) == 100, "weights must sum to 100"
    b = split_bucket(key_col)
    train_hi, val_hi = weights[0], weights[0] + weights[1]
    return df.withColumn(
        out_col,
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_by: str | None = "source",
    order_by: str = "doc_id",
    out_col: str = "seq_id",
) -> DataFrame:
    """Assign each document to a fixed-budget training sequence:
    documents are laid out back-to-back in (partition, order) order and
    cut into sequences of `budget` tokens; a document's sequence is
    floor(tokens_before_it / budget) — one prefix-sum window per
    source partition (embarrassingly parallel across sources; for a
    single global stream route the cumsum through
    windows.cum_agg_global instead). Documents longer than `budget`
    occupy multiple sequences; `seq_id` is where they start, matching
    the packed-pretraining layout where sequences are filled greedily
    and split mid-document."""
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(order_by)
    else:
        w = Window.orderBy(order_by)
    cum_before = F.coalesce(
        F.sum("_ntok").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        docs.withColumn("_ntok", n_tok)
        .withColumn(out_col, F.floor(cum_before / budget))
        .withColumnRenamed("_ntok", "n_tokens")
    )


# --- PII redaction -------------------------------------------------------
# Pattern dialect note: every regex below sticks to the intersection of
# Java regex (Spark executors) and RE2 (DuckDB oracle / Go tooling) —
# character classes, bounded quantifiers, \b, \d — no lookarounds, no
# backreferences — so redaction is bit-identical across engines.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (category, pattern, replacement token); order matters — emails
    # are consumed before phone/IP rules can bite their digit runs,
    # SSNs before the phone rule (both are dashed digit groups).
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # NANP 3-3-4 (optionally with country code) first, then the short
    # cc-3-4 form; longest alternative first so '+1-555-123-4567'
    # can't half-match and leak digits beside the token
    (
        "phone",
        r"(?:\+?\d{1,2}-)?\d{3}-\d{3}-\d{4}\b|\+?\d{1,2}-\d{3}-\d{4}\b",
        "[PHONE]",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(text_col: str | Column) -> Column:
    """Replace PII spans with category tokens — pure JVM-side
    regexp_replace chain (one generated-code pass per category, no
    Python, no shuffle; at 100 TB this is a map-only stage that
    pipelines into whatever scan feeds it). Categories and order are
    `PII_PATTERNS`; apply before tokenization so the replacement
    tokens survive into training data as explicit markers."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts by category plus the redacted length
    delta — the audit artifact a curation run logs next to the
    redacted corpus. Column-expression only (regexp_count), so it
    partially aggregates map-side when summed.

    Each category is counted on the text with all PRIOR categories
    already redacted — exactly what the sequential redact_pii pass
    replaces — so the counts always agree with len_delta (counting
    every category on the raw text would e.g. report a phone inside an
    email address that redaction consumed as one [EMAIL])."""
    cur = F.col(text_col)
    counts = []
    for name, pattern, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pattern)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pattern, token)
    return docs.select(
        id_col,
        *counts,
        (F.length(F.col(text_col)) - F.length(cur)).alias("len_delta"),
    )
