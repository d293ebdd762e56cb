"""Text analysis for training-data curation: language ID, quality
scoring, token counting, fingerprinting.

All pure Column expressions (JVM, codegen) — no Python in the hot
path; at 100 TB these run as narrow map stages over the corpus with
zero shuffle.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints (PEP 563 strings)

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal function-word lists for the n-gram/stopword language
# heuristic. Deliberately tiny: the signal is presence of very frequent
# function words; good enough for coarse routing, deterministic.
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "nicht"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _tokens(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(text_col: str = "text", mode: str = "whitespace") -> Column:
    """Token count: whitespace words, or a BPE-ish regex segmentation
    (letters / digits / single punctuation — a proxy for subword
    tokenizer cost accounting)."""
    if mode == "whitespace":
        return F.size(_tokens(text_col))
    if mode != "bpe":
        # a typo'd mode silently fell through to the BPE path and
        # returned materially different counts
        raise ValueError(f"token_count: unknown mode {mode!r}")
    # Count matches of _BPE_ISH without materializing them (guide §2.3
    # narrow-the-work): collapse every letter run to 'a' and every
    # digit run to '0' — runs are maximal and the three alternation
    # classes are disjoint, so afterwards EVERY match is exactly one
    # non-space char — then count non-space chars. Equal to
    # size(regexp_extract_all(_BPE_ISH)) by construction (verified 0
    # mismatches over the 2M-doc corpus); 6x faster at 2M docs
    # (16.1 s -> 2.7 s) because no per-match string array is built.
    return F.regexp_count(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), "[A-Za-z]+", "a"),
            "[0-9]+",
            "0",
        ),
        F.lit(r"\S"),
    )


def _lang_counts(text_col) -> Column:
    """Struct of per-language stopword occurrence counts, computed in
    ONE aggregate pass over the token array. One filter+size per
    language reads fine but inlines the tokenization subtree per
    language and allocates an intermediate array each — the bigger
    expression tree also bloats generated code (compile time is a real
    per-query cost). Counts multiplicity, like the filter formulation
    (set-wise array_intersect would not)."""
    toks = _tokens(text_col)
    langs = list(_STOPWORDS)
    # r13 measured NEGATIVE result: a packed-long variant (one literal
    # map lookup per token, 12-bit count field per language, plain long
    # sum) times at 3.3 s vs 4.9 s for this struct aggregate when the
    # packed value is referenced ONCE — but unpacking 5 fields
    # references the aggregate 5x, and interpreted HOFs get no
    # common-subexpression elimination, so the decoded form measured
    # 27 s at 2M docs. Kept the struct form.
    init = F.struct(*[F.lit(0).alias(lang) for lang in langs])
    counts = F.aggregate(
        toks,
        init,
        lambda acc, t: F.struct(
            *[
                (acc[lang] + t.isin(_STOPWORDS[lang]).cast("int")).alias(lang)
                for lang in langs
            ]
        ),
    )
    return counts


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    counts = _lang_counts(text_col)
    return {lang: counts[lang] / n for lang in _STOPWORDS}


def lang_id(text_col: str = "text", default: str = "unknown", min_score: float = 0.0) -> Column:
    """Argmax language over stopword-hit ratios; `default` when no
    language scores above min_score. Ratios share one denominator, so
    the argmax (score, then language string on ties) is identical to
    the per-ratio formulation."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    counts = _lang_counts(text_col)
    # CJK script detection must run at the CHARACTER level: real
    # Chinese text has no whitespace between words, so the token-based
    # zh stopword ratio can never fire on unsegmented input. The signal
    # joins the candidate array as a dominating zh entry (score 9 when
    # over a third of the characters are CJK ideographs) rather than an
    # outer when() — wrapping the argmax in another conditional pushed
    # the generated code past the codegen method limit and ran the
    # whole expression interpreted (~4x slower at sf0.1).
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.greatest(F.length(c), F.lit(1))
    cjk_ratio = F.length(F.regexp_replace(c, r"[^一-鿿]", "")) / n_chars
    entries = [
        F.struct((counts[lang] / n).alias("s"), F.lit(lang).alias("l"))
        for lang in _STOPWORDS
    ]
    entries.append(
        F.struct(
            F.when(cjk_ratio > 0.33, F.lit(9.0)).otherwise(F.lit(-1.0)).alias("s"),
            F.lit("zh").alias("l"),
        )
    )
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > min_score, best["l"]).otherwise(F.lit(default))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, word stats, punctuation and
    stopword ratios, uppercase ratio, digit ratio."""
    c = F.col(text_col)
    toks = _tokens(text_col)
    n_chars = F.length(c)
    n_words = F.size(toks)
    stop_en = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS["en"])))
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0, (F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)) / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            # regexp_count of the class == length after deleting its
            # complement (same char set), without building the stripped
            # string: 2.1 s -> 0.35 s at 2M docs (r13)
            F.regexp_count(c, F.lit(r"[\.,;:!\?\"'\(\)]")).cast("bigint")
            / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn("stopword_ratio", stop_en / F.greatest(n_words, F.lit(1)))
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    """Composite [0,1] quality score: length sweet-spot, sane word
    length, some stopwords, low digit/punct noise — a Gopher-rules-like
    linear blend, fully declarative."""
    feats = quality_features(df, text_col)
    len_ok = F.when(
        (F.col("n_words") >= 10) & (F.col("n_words") <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    wlen_ok = F.when(
        (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    stop_ok = F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
    noise = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("digit_ratio") * 2 - F.col("punct_ratio")
    )
    return feats.withColumn(
        out_col, (len_ok * 0.3 + wlen_ok * 0.2 + stop_ok * 0.2 + noise * 0.3)
    )


def fingerprint(
    text_col: str = "text",
    window: int = 8,
    hash: str = "xxhash64",
) -> Column:
    """Document fingerprint: minimum of rolling window-gram hashes over
    the token stream (winnowing-style min-sampling, deterministic).
    Equal fingerprints → high overlap candidates.

    ``hash='xxhash64'`` (default, the scale path): tokens are hashed
    ONCE on the JVM (xxhash64 — no window-gram strings are ever
    materialized); the rotate-XOR window combine and the min run as
    ONE Arrow-batched numpy pass per document instead of window-1
    interpreted zip_with layers (higher-order functions never enter
    whole-stage codegen, so at 8×~200 tokens the HOF tree spent ~1M
    interpreted lambda evaluations per 5k docs). uint64 shifts in
    numpy are bit-identical to the JVM's shiftleft /
    shiftrightunsigned / XOR on long, and the min compares the int64
    view, matching array_min over signed longs. Documents shorter than
    one window hash their whole token stream (JVM branch, unchanged).

    ``hash='md5'`` (the cross-engine oracle path): each TOKEN is
    hashed once with the first 48 bits of md5 — an algorithm every
    engine shares bit-for-bit — and windows combine with the same
    rotate-XOR fold (13-bit rotate within 48 bits, overflow-safe in
    BIGINT engines), so the whole fingerprint is re-derivable in ANSI
    SQL: rotation is linear over XOR, hence the fold equals the 8-term
    closed form XOR_j rot^(w-1-j)(h[i+j]) the driver oracle evaluates
    in DuckDB. Same one-numpy-pass shape as the default path."""
    if hash not in ("xxhash64", "md5"):
        raise ValueError(f"fingerprint: unknown hash {hash!r}")
    from pyspark.sql.functions import pandas_udf

    toks = _tokens(text_col)
    size = F.size(toks)
    if hash == "md5":
        tokh = F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
        )
        mask = (1 << 48) - 1
        rot_l, rot_r = 13, 48 - 13
        whole = F.conv(
            F.substring(F.md5(F.concat_ws(" ", toks)), 1, 12), 16, 10
        ).cast("long")
    else:
        tokh = F.transform(toks, lambda t: F.xxhash64(t))
        mask = (1 << 64) - 1
        rot_l, rot_r = 13, 64 - 13
        whole = F.xxhash64(F.concat_ws(" ", toks))

    @pandas_udf("long")
    def gram_min(hashes: pd.Series) -> pd.Series:
        import numpy as np

        w = window
        m = np.uint64(mask)
        rl, rr = np.uint64(rot_l), np.uint64(rot_r)
        out = np.zeros(len(hashes), dtype="int64")
        for i, arr in enumerate(hashes):
            if arr is None:
                continue
            h = np.asarray(arr, dtype="int64").view("uint64")
            if h.size < w:  # short-doc rows use the JVM branch's value
                continue
            g = h
            for k in range(1, w):
                head = g[: h.size - k]
                g = (((head << rl) & m) | (head >> rr)) ^ h[k:]
            out[i] = g.view("int64").min()
        return pd.Series(out)

    return F.when(size >= window, gram_min(tokh)).otherwise(whole)
