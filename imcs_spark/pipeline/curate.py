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
    hits = doc_grams.join(F.broadcast(bench_grams), "shingle", "left_semi").select(
        id_col
    )
    # distinct + BROADCAST the hit set (round 14, guide §3.1): Catalyst
    # cannot estimate the hit side (explode lineage) and planned the
    # docs-vs-hits join as SortMergeJoin — an Exchange+Sort of the WHOLE
    # corpus INCLUDING text (1.9 GB shuffle write at the 2M soak) to
    # drop a few hundred contaminated rows, violating this docstring's
    # own "the corpus is never shuffled". The distinct's exchange
    # carries only matching (id) rows — benchmark contamination is
    # eval-suite-scale by construction — and the broadcast turns the
    # corpus side into a narrow pass over the cached/scanned rows.
    # (r13 had removed the drop-mode distinct as "a pure extra
    # exchange"; with the broadcast it is what BOUNDS the build side.)
    hits = hits.distinct()
    if mode == "drop":
        return docs.join(F.broadcast(hits), id_col, "left_anti")
    return docs.join(
        F.broadcast(hits.withColumn("contaminated", F.lit(True))),
        id_col,
        "left",
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


def hash48(key_col: str | Column) -> Column:
    """Uniform 48-bit integer from the md5 of the key (first 12 hex
    digits) — THE engine-stability convention every hash-ordered
    operator shares (split_bucket, pipeline.sample), recomputable in
    DuckDB as ('0x' || substring(md5(k), 1, 12))::BIGINT. One
    implementation: forking it would silently desynchronize sampling
    from splitting and from the SQL oracles."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("long")


def split_bucket(key_col: str | Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the key —
    stable across engines (hash48; the old 16-bit prefix silently
    broke past 65,536 buckets and skewed badly approaching it). Use a
    stable business key (id, URL), never a row position."""
    if not 0 < buckets <= 1 << 31:
        # 2^31 still yields int-safe bucket ids (max id 2^31 - 1); past
        # that the int cast below would overflow
        raise ValueError(f"split_bucket: buckets must be in (0, 2^31], got {buckets}")
    return (hash48(key_col) % buckets).cast("int")


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


def cluster_split(
    df: DataFrame,
    pairs: DataFrame | None = None,
    components: DataFrame | None = None,
    key_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
    out_col: str = "split",
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Leakage-safe dataset split: every document in a near-duplicate
    CLUSTER is assigned the split of the cluster's minimum-id
    representative, so a near-copy of a test document can never land
    in train — the benchmark-leakage path that hashing each doc id
    independently (dataset_split) leaves open whenever dedup keeps
    more than one cluster member (or runs after splitting).

    Pass either `pairs` (verified near-dup edges, e.g. minhash
    jaccard_pairs output — connected components are computed here) or
    a precomputed `components` frame (columns node/comp, the
    connected_components contract) when the caller already has one.
    Documents in no cluster hash by their own key — identical to
    dataset_split on a pair-free corpus.

    Scale shape: one left join of the corpus against the component
    map (small — only clustered docs appear; auto-broadcast while it
    fits) plus dataset_split's map-only bucketing. No extra shuffle
    beyond the CC itself."""
    if (pairs is None) == (components is None):
        raise ValueError("cluster_split: pass exactly one of pairs / components")
    if components is None:
        from .dedup import connected_components

        components = connected_components(pairs, left_col, right_col)
    rep = components.select(
        F.col("node").alias(key_col), F.col("comp").alias("_rep")
    )
    keyed = df.join(rep, key_col, "left").withColumn(
        "_skey", F.coalesce(F.col("_rep"), F.col(key_col))
    )
    return dataset_split(
        keyed, key_col="_skey", weights=weights, out_col=out_col
    ).drop("_rep", "_skey")


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
# backreferences in the PATTERN (Java `$1` / RE2 `\1` in the
# REPLACEMENT is fine: each engine spells it its own way) — so
# redaction is bit-identical across engines.
#
# Phone boundary note: \b can't anchor the start of a digit-run
# pattern that may begin with '+' (non-word char), so the phone rule
# uses a match-and-keep leading guard `(^|[^0-9])` with `$1` in the
# replacement — a digit-glued run like '8555-123-4567' is now left
# alone (symmetric with the SSN rule) instead of half-redacted.
#
# IPv6 subset (documented): full 8-group form, and `::`-compressed
# forms whose FIRST group contains at least one digit (2001:, fe80:,
# fd00:, ... all qualify). The digit requirement keeps all-hex-letter
# identifiers like C++ `a::b` / `std::vector` ('d' is hex!) from
# being eaten; the cost is missing `::1` / `abcd:beef::1`-style
# addresses with no digit before the `::`.
_HEXG = "[0-9A-Fa-f]{1,4}"
# exactly 1-4 hex chars, at least one of them a decimal digit
_HEXG_DIG = (
    "(?:[0-9][0-9A-Fa-f]{0,3}|[A-Fa-f][0-9][0-9A-Fa-f]{0,2}"
    "|[A-Fa-f]{2}[0-9][0-9A-Fa-f]?|[A-Fa-f]{3}[0-9])"
)
IPV6_PATTERN = (
    rf"\b(?:{_HEXG}:){{7}}{_HEXG}\b"  # full 8-group form
    # compressed, hex present after the '::' (leftmost-first: before
    # the trailing-:: alternative so '2001:db8::1' takes the long form)
    rf"|\b{_HEXG_DIG}(?::{_HEXG}){{0,5}}::{_HEXG}(?::{_HEXG}){{0,5}}\b"
    rf"|\b{_HEXG_DIG}(?::{_HEXG}){{0,6}}::"  # trailing '::' (fe80::)
)

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (category, pattern, replacement); order matters — emails are
    # consumed before phone/IP rules can bite their digit runs, SSNs
    # before the phone rule (both are dashed digit groups); the
    # Luhn-gated credit-card stage (not a plain regex — see
    # redact_pii) runs between ssn and phone so 4-4-4-4 card groups
    # are consumed before the phone rule can nibble their tail.
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
        r"(^|[^0-9])((?:\+?\d{1,2}-)?\d{3}-\d{3}-\d{4}|\+?\d{1,2}-\d{3}-\d{4})\b",
        "$1[PHONE]",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ipv6", IPV6_PATTERN, "[IPV6]"),
]

# 13-19 digits with optional single space/dash separators, \b-bounded:
# longer digit runs fail the trailing \b at every greedy retry, so a
# 20+-digit run is (correctly) never partially matched.
CCARD_PATTERN = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_check(col: str | Column) -> Column:
    """True when the digits of `col` (separators stripped) pass the
    Luhn checksum — pure Column algebra (reverse → per-char transform
    with index → aggregate), no Python."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(
        F.split(F.reverse(F.regexp_replace(c, "[^0-9]", "")), ""),
        lambda x: x != "",
    )
    digs = F.transform(chars, lambda x: x.cast("int"))
    s = F.aggregate(
        F.transform(
            digs,
            lambda d, i: F.when(i % 2 == 0, d).otherwise(
                F.when(d < 5, d * 2).otherwise(d * 2 - 9)
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return s % 10 == 0


def _ccard_valid(text: Column) -> Column:
    """Array of Luhn-valid card-number spans found in `text`."""
    cands = F.regexp_extract_all(text, F.lit(CCARD_PATTERN), 0)
    return F.filter(cands, luhn_check)


def _ccard_redact(text: Column, valid: Column) -> Column:
    """Replace each Luhn-valid span with [CCARD] (fold over the
    candidate array). The replace is \\b-anchored on both sides: a
    plain literal replace corrupted any LONGER digit run that merely
    contained a valid card as a substring ('9<card>' became
    '9[CCARD]' even though the 17-digit run was itself a rejected
    candidate). Candidates only ever contain digits, spaces, and
    dashes, so splicing them into a regex needs no escaping."""
    return F.aggregate(
        valid,
        text,
        lambda acc, cand: F.regexp_replace(
            acc, F.concat(F.lit(r"\b"), cand, F.lit(r"\b")), F.lit("[CCARD]")
        ),
    )


# stage list actually applied, in order: regex categories from
# PII_PATTERNS with the Luhn-gated ccard stage spliced after ssn
PII_CATEGORIES = ["email", "ssn", "ccard", "phone", "ipv4", "ipv6"]


def _pii_stages():
    pat = {name: (p, r) for name, p, r in PII_PATTERNS}
    for name in PII_CATEGORIES:
        yield (name, None) if name == "ccard" else (name, pat[name])


def redact_pii(text_col: str | Column) -> Column:
    """Replace PII spans with category tokens — JVM-side Column chain
    (one generated-code pass per category, no Python, no shuffle; at
    100 TB this is a map-only stage that pipelines into whatever scan
    feeds it). Regex categories are `PII_PATTERNS`; the credit-card
    category is Luhn-gated (regex candidates → Column-algebra checksum
    → literal replace), so look-alike digit runs that fail the
    checksum are left untouched — and guarded by a cheap rlike so the
    interpreted array machinery only runs on rows that contain a
    card-like digit run at all. Apply before tokenization so the
    replacement tokens survive into training data as explicit markers.

    This is the single-Column form for ad-hoc/SQL-surface use. In
    pipelines use :func:`redact_pii_batch`: interleaving six regex
    node graphs per row defeats the JVM's Pattern.match specialization
    and costs 10-25x the stage-batched form at corpus scale (measured
    round 8 — see the note above redact_pii_batch)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pr in _pii_stages():
        if name == "ccard":
            c = F.when(
                c.rlike(CCARD_PATTERN), _ccard_redact(c, _ccard_valid(c))
            ).otherwise(c)
        else:
            c = F.regexp_replace(c, pr[0], pr[1])
    return c


def pii_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts by category plus the redacted length
    delta — the audit artifact a curation run logs next to the
    redacted corpus. Column-expression only (regexp_count /
    array-size), so it partially aggregates map-side when summed.

    Each category is counted on the text with all PRIOR categories
    already redacted — exactly what the sequential redact_pii pass
    replaces — so the counts always agree with len_delta (counting
    every category on the raw text would e.g. report a phone inside an
    email address that redaction consumed as one [EMAIL]).

    Each stage is MATERIALIZED as its own projected column (not one
    nested expression): the Luhn stage's higher-order functions run
    interpreted, where common-subexpression elimination does not
    apply, so a single nested chain re-evaluated the whole prefix once
    per downstream count (~8x the regex work per row). Stepwise
    attributes keep every expression evaluated exactly once, and the
    rlike guard skips the interpreted card machinery on the vast
    majority of rows with no card-like digit run."""
    d = docs.select(
        F.col(id_col), F.col(text_col).alias("_t"), F.length(text_col).alias("_len0")
    )
    for name, pr in _pii_stages():
        if name == "ccard":
            has = F.col("_t").rlike(CCARD_PATTERN)
            d = d.withColumn(
                "_cands",
                F.when(has, _ccard_valid(F.col("_t"))).otherwise(
                    F.array().cast("array<string>")
                ),
            )
            d = d.withColumn(f"n_{name}", F.size("_cands"))
            d = d.withColumn(
                "_t2", _ccard_redact(F.col("_t"), F.col("_cands"))
            ).drop("_cands")
        else:
            d = d.withColumn(f"n_{name}", F.regexp_count(F.col("_t"), F.lit(pr[0])))
            d = d.withColumn("_t2", F.regexp_replace(F.col("_t"), pr[0], pr[1]))
        d = d.drop("_t").withColumnRenamed("_t2", "_t")
    return d.select(
        id_col,
        *[f"n_{name}" for name in PII_CATEGORIES],
        (F.col("_len0") - F.length("_t")).alias("len_delta"),
    )


# --- batched PII redaction (the 100 TB path) -----------------------------
# Round-8 measurement (2M-doc soak, local[32]): the single-Column
# redact_pii chain above costs 10-25x the SUM of its stages run alone —
# 203 s for the full chain at 2M docs where the six stages isolated
# total ~8 s, reproducible with whole-stage codegen ON or OFF, with or
# without the CASE/HOF ccard stage, and independent of document content
# (a pass-through inner stage shows the same blowup: phone(email) on
# docs with zero email matches = 12.6 s/200k vs phone alone 0.5 s).
# The trigger is ROW-INTERLEAVING: evaluating six large java.util.regex
# node graphs alternately per row defeats the JVM's dispatch/branch
# specialization of Pattern.match, so every pattern runs at interpreter
# -like speed; one pattern per tight loop is 10-25x faster. That is the
# columnar-engine thesis in miniature, and the fix is stage-BATCHED
# execution: an Arrow-batched pandas UDF applies ONE compiled pattern
# per pass over the whole batch (2M docs: 11 s vs 203 s measured).
#
# Dialect parity — the subtle part (found by the adversarial fuzz in
# test_property_round5): the three engines SPLIT on \b and \d.
#   \d : Java ASCII-only; RE2 ASCII-only; Python DEFAULT is Unicode
#        (U+06F1 ۱ matches!) and re.ASCII fixes it.
#   \b : Java is UNICODE-aware BY DEFAULT ('café4111…' has NO boundary
#        before the 4 — é is a word char); RE2 and re.ASCII are
#        ASCII-\b (boundary exists → match).
# So no single Python flag reproduces Java — and (round 9, found by a
# live JVM probe) neither does Python's Unicode \w: the JDK's default
# \b (Pattern.java Bound, no UNICODE_CHARACTER_CLASS) defines
#   word(ch) = ch=='_' OR Character.isLetterOrDigit(ch)   [L* ∪ Nd]
#              OR (Mn AND hasBaseCharacter)
# where the last clause makes a NON-SPACING MARK a word char only when
# it sits (through a run of marks) on a letter-or-digit base — so
# '…6789́' has NO trailing boundary (mark glued to the 9) while a
# bare leading '́123-…' DOES have one, and Nl/No numerals,
# spacing marks (Mc/Me), non-'_' connector punctuation and ZWJ/ZWNJ
# are all NON-word (several of those are word chars to Python \w).
# The engine's semantics are the JAVA ones (the Column forms define
# them, and batch≡column must hold on ALL inputs), so the Python twins
# compile with the `regex` module and rewrite every \b into the exact
# JDK rule as lookarounds (below), with \d textually rewritten to
# [0-9] — matching Java's \d. The DuckDB oracles remain valid because
# their synthesized PII is ASCII-adjacent, where all engines agree;
# the residual Java-vs-RE2 \b divergence on non-ASCII-glued digit runs
# is a documented oracle-domain bound, not an engine bug. Java's $1
# replacement becomes Python \1.

import re as _re


def _rx_mod():
    """The third-party `regex` module, imported LAZILY (round-10
    ADVICE): it is needed only by the PII Python oracle twins (exact
    JDK \\b semantics require \\p{M}/\\p{Pc} classes stdlib `re`
    lacks), and an unconditional module-level import would break ALL
    of pipeline.curate in environments without it — including callers
    never touching PII (the Spark-side redaction itself is JVM
    regexp). Executors running the PII twins still need `regex`
    installed; the error below names the package."""
    try:
        import regex
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "pipeline.curate's PII Python twins require the third-party"
            " 'regex' module (pip install regex): exact JDK \\b"
            " semantics need \\p{M}/\\p{Pc} character classes that"
            " the stdlib re engine does not support"
        ) from e
    return regex

# The JDK Bound rule as lookarounds. Every \b in the PII patterns is
# adjacent to a guaranteed word char INSIDE the match (a digit or hex
# digit), so \b reduces to "the OTHER side is not word":
#   leading \b  -> _JAVA_NL: char before is not letter/digit/_ and not
#                  a mark-run on a letter/digit base;
#   trailing \b -> _JAVA_NR: next char is not letter/digit/_ and not a
#                  mark whose backward mark-run scan finds a
#                  letter/digit base (the scan sees the just-matched
#                  digits, reproducing JDK hasBaseCharacter).
# Pinned against live Spark/JVM behavior across Mn/Mc/Me/Pc/Nl/No/
# ZWJ/ZWNJ/mark-run/underscore-base cases in
# tests/test_property_round5.py::test_java_word_boundary_parity.
_JAVA_NL = r"(?<![\p{L}\p{Nd}_])(?<![\p{L}\p{Nd}]\p{Mn}+)"
_JAVA_NR = r"(?![\p{L}\p{Nd}_])(?!(?=\p{Mn})(?<=[\p{L}\p{Nd}]\p{Mn}*))"


def _rewrite_java_b(p: str) -> str:
    """Rewrite every \\b in a PII pattern to the exact JDK boundary
    rule. Positional: a \\b followed by a digit-ish atom ('\\d', '(',
    '[') is a leading boundary, one followed by '|' / ')' / end is
    trailing; any other context is unsupported (asserted — all PII
    patterns keep \\b digit-adjacent)."""
    out: list[str] = []
    i = 0
    while i < len(p):
        if p.startswith(r"\b", i):
            nxt = p[i + 2: i + 3]
            if nxt in ("(", "[") or p.startswith(r"\d", i + 2):
                out.append(_JAVA_NL)
            elif nxt in ("|", ")", ""):
                out.append(_JAVA_NR)
            else:
                raise ValueError(f"\\b in unsupported context: {p[i:i+6]!r}")
            i += 2
        else:
            out.append(p[i])
            i += 1
    return "".join(out)


def _py_pat(p: str):
    # no PII pattern uses \d inside a character class (asserted by the
    # fuzz suite), so a textual rewrite is exact
    return _rx_mod().compile(_rewrite_java_b(p.replace("\\d", "[0-9]")))


# compiled lazily on first PII use (see _rx_mod); the compiled pattern
# objects are pickled into the pandas-UDF closures as before — laziness
# moves WHERE the missing-module error surfaces, not the dependency
_PII_CACHE: dict[str, object] = {}


def _pii_compiled() -> list[tuple[str, object, str]]:
    if "pii" not in _PII_CACHE:
        _PII_CACHE["pii"] = [
            (name, _py_pat(p), _re.sub(r"\$(\d)", r"\\\1", r))
            for name, p, r in PII_PATTERNS
        ]
    return _PII_CACHE["pii"]


def _ccard_compiled():
    if "ccard" not in _PII_CACHE:
        _PII_CACHE["ccard"] = _py_pat(CCARD_PATTERN)
    return _PII_CACHE["ccard"]


_NON_DIGIT = _re.compile(r"[^0-9]")


def _luhn_ok_py(span: str) -> bool:
    digs = [int(ch) for ch in _NON_DIGIT.sub("", span)][::-1]
    s = sum(d if i % 2 == 0 else (d * 2 if d < 5 else d * 2 - 9) for i, d in enumerate(digs))
    return s % 10 == 0


def _ccard_hit(t) -> bool:
    return isinstance(t, str) and _ccard_compiled().search(t) is not None


_PII_SCREENS: dict[str, tuple[str, str]] = {
    # Vectorized Arrow pre-screens (r13): each entry is a NECESSARY
    # condition of its exact pattern — the pattern minus its \b /
    # guard context, or a literal token it must contain — evaluated in
    # Arrow C++ over the whole batch. Rows failing the screen CANNOT
    # match the exact pattern, so the per-row Python regex pass runs
    # only on screened rows (guide §4.2: hand batches to vectorized
    # native kernels). False positives cost one exact scan; false
    # negatives are impossible by construction (every screen is a
    # strictly weaker pattern). Fuzz-pinned against the exact patterns
    # by tests/test_pipeline.py.
    "email": ("substr", "@"),
    "ssn": ("regex", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    "ccard": ("regex", "([0-9][ -]?){12,18}[0-9]"),
    # both phone alternations end in ddd-dddd
    "phone": ("regex", "[0-9]{3}-[0-9]{4}"),
    "ipv4": ("regex", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    # all three IPV6_PATTERN alternatives contain >= 2 ':' (full form
    # 7; both compressed forms contain the '::' pair)
    "ipv6": ("colons2", ":"),
}


def _screen_mask(s, name: str):
    """Boolean ndarray over pandas Series `s`: rows that MAY match PII
    category `name` (null-safe: null text -> False)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # type=string(): an all-null batch otherwise infers Arrow `null`
    # type, for which the match kernels have no implementation
    arr = pa.Array.from_pandas(s, type=pa.string())
    kind, tok = _PII_SCREENS[name]
    if kind == "substr":
        m = pc.match_substring(arr, tok)
    elif kind == "colons2":
        m = pc.greater_equal(pc.count_substring(arr, tok), 2)
    else:
        m = pc.match_substring_regex(arr, tok)
    return pc.fill_null(m, False).to_numpy(zero_copy_only=False)


def _subber(pat, repl):
    """Per-batch sub closure preserving nulls (NaN/None pass through
    untouched, like pandas .str.replace)."""
    return lambda t: pat.sub(repl, t) if isinstance(t, str) else t


def _counter(pat):
    """Per-batch match counter preserving nulls (NaN count for NULL
    text, like pandas .str.count)."""
    return lambda t: len(pat.findall(t)) if isinstance(t, str) else None


def _ccard_redact_py(t: str) -> str:
    # non-overlapping left-to-right candidates, fold in document order —
    # the exact semantics of the Column form's regexp_extract_all +
    # aggregate; candidates contain only [0-9 -] so no escaping needed
    for cand in _ccard_compiled().findall(t):
        if _luhn_ok_py(cand):
            t = _rx_mod().sub(_JAVA_NL + cand + _JAVA_NR, "[CCARD]", t)
    return t


def redact_pii_batch(text_col: str | Column) -> Column:
    """PII redaction, stage-batched: same categories, order, and output
    as :func:`redact_pii`, but each pattern runs in its own tight loop
    over the Arrow batch instead of interleaving per row — the scale
    path (see the measurement note above; 18x at 2M docs). Use this in
    pipelines; the Column form remains for SQL-surface/ad-hoc use and
    as the JVM-side cross-check."""
    from pyspark.sql.functions import pandas_udf
    import pandas as pd  # noqa: F401

    @pandas_udf("string")
    def _redact(s):
        # pandas .str ops reject regex-module patterns (they require
        # re.Pattern), so patterns apply via map — still one compiled
        # pattern per tight pass over the batch (the batching thesis;
        # .str.replace is an equivalent per-row Python loop inside)
        for name in PII_CATEGORIES:
            # Arrow pre-screen: skip the per-row Python regex pass for
            # rows that cannot match (the screen is a necessary
            # condition of the exact pattern — see _PII_SCREENS)
            screen = _screen_mask(s, name)
            if not screen.any():
                continue
            if name == "ccard":
                sub = s[screen]
                mask = sub.map(_ccard_hit)
                if mask.any():
                    s = s.copy()
                    hit = sub[mask]
                    s[hit.index] = hit.map(_ccard_redact_py)
            else:
                _, pat, repl = next(x for x in _pii_compiled() if x[0] == name)
                s = s.copy()
                s[screen] = s[screen].map(_subber(pat, repl))
        return s

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _redact(c)


def pii_profile_batch(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """:func:`pii_profile`, stage-batched (see the round-8 note above
    redact_pii_batch): one compiled pattern per pass over each Arrow
    batch instead of twelve interleaved regex programs per row — the
    stepwise Column form measured 36 s/200k docs, this form ~2 s.
    Identical output contract: per-document counts per category, each
    counted on the text with all PRIOR categories already redacted,
    plus len_delta; equality-tested against the Column form."""
    import pandas as pd

    out_fields = ", ".join(f"n_{n} int" for n in PII_CATEGORIES)
    schema = f"{id_col} long, {out_fields}, len_delta int"

    def gen(batches):
        for pdf in batches:
            s = pdf[text_col]
            len0 = s.str.len()
            out = {id_col: pdf[id_col]}
            # NULL text -> NULL counts for the plain-regex categories
            # (matching regexp_count(NULL)); computed once — redaction
            # never changes which rows are null
            nulls = s.isna()
            for name in PII_CATEGORIES:
                # Arrow pre-screen (see _PII_SCREENS): rows failing it
                # cannot match, so they count 0 (or NA for NULL text)
                # without running the Python regex
                screen = _screen_mask(s, name)
                if name == "ccard":
                    n = pd.Series(0, index=s.index, dtype="int64")
                    if screen.any():
                        sub0 = s[screen]
                        mask = sub0.map(_ccard_hit)
                        if mask.any():
                            sub = sub0[mask]
                            cands = sub.map(
                                lambda t: [
                                    c
                                    for c in _ccard_compiled().findall(t)
                                    if _luhn_ok_py(c)
                                ]
                            )
                            n[sub.index] = cands.map(len)
                            s = s.copy()
                            s[sub.index] = [
                                _apply_ccard_subs(t, cs)
                                for t, cs in zip(sub.tolist(), cands.tolist())
                            ]
                else:
                    _, pat, repl = next(x for x in _pii_compiled() if x[0] == name)
                    n = pd.Series(0, index=s.index, dtype="object")
                    n[nulls] = None
                    if screen.any():
                        n[screen] = s[screen].map(_counter(pat))
                        s = s.copy()
                        s[screen] = s[screen].map(_subber(pat, repl))
                # NULL text -> NULL counts, exactly like the Column
                # form's regexp_count(NULL) (the ccard count is 0 there
                # because its guard's otherwise-branch yields an empty
                # array — the int64 init above matches); nullable Int32
                # keeps the NA through Arrow
                out[f"n_{name}"] = n.astype("Int32")
            out["len_delta"] = (len0 - s.str.len()).astype("Int32")
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def _apply_ccard_subs(t: str, cands: list) -> str:
    for cand in cands:
        t = _rx_mod().sub(_JAVA_NL + cand + _JAVA_NR, "[CCARD]", t)
    return t
