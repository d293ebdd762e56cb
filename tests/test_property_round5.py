"""Seeded randomized property tests for the round-5 surfaces: the
Luhn gate, the mp4 container round trip, the fingerprint fold/closed
form identity the DuckDB oracle relies on, and murmur3_32 over random
inputs. Pure-Python models are the ground truth; Spark cases ride in
one DataFrame per property (the same pattern as test_property_multi).
"""

import random
import struct
from functools import reduce

from pyspark.sql import functions as F


def _luhn_model(digits: str) -> bool:
    s = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


def _luhn_complete(prefix: str) -> str:
    """Append the check digit that makes `prefix` Luhn-valid."""
    for d in "0123456789":
        if _luhn_model(prefix + d):
            return prefix + d
    raise AssertionError("unreachable")


def test_luhn_property_random(spark):
    """Random 13-19 digit numbers completed to Luhn validity pass;
    any single-digit mutation fails (Luhn detects all single-digit
    errors); random uncompleted strings agree with the model."""
    from imcs_spark.pipeline.curate import luhn_check

    rng = random.Random(1234)
    rows = []
    expect = []
    for _ in range(40):
        n = rng.randint(13, 19)
        base = "".join(rng.choice("0123456789") for _ in range(n - 1))
        valid = _luhn_complete(base)
        rows.append((valid,))
        expect.append(True)
        # single-digit mutation
        pos = rng.randrange(n)
        old = valid[pos]
        new = rng.choice([c for c in "0123456789" if c != old])
        mutated = valid[:pos] + new + valid[pos:][1:]
        rows.append((mutated,))
        expect.append(False)
        # arbitrary string: agree with the model
        raw = "".join(rng.choice("0123456789") for _ in range(n))
        rows.append((raw,))
        expect.append(_luhn_model(raw))
    df = spark.createDataFrame(rows, "c string")
    got = [r.ok for r in df.select(luhn_check("c").alias("ok")).collect()]
    assert got == expect


def test_mp4_roundtrip_property():
    """Random sample counts / sizes / chunk splits / geometry: the
    parsed sample table must reproduce the construction exactly and
    every resolved byte range must equal its payload."""
    from imcs_spark.pipeline import mp4

    rng = random.Random(77)
    for _ in range(25):
        n = rng.randint(1, 12)
        payloads = [
            bytes(rng.randrange(256) for _ in range(rng.randint(1, 120)))
            for _ in range(n)
        ]
        split = rng.choice([None] + list(range(1, n)))
        ts = rng.choice([1000, 30000, 90000])
        delta = rng.randint(1, 5000)
        w, h = rng.randint(1, 4096), rng.randint(1, 4096)
        blob = mp4.encode_mp4(
            payloads, sample_delta=delta, timescale=ts,
            width=w, height=h, chunk_split=split,
        )
        info = mp4.parse_mp4(blob)
        assert info["timescale"] == ts and info["duration"] == n * delta
        t = info["tracks"][0]
        assert (t["width"], t["height"]) == (w, h)
        assert t["n_samples"] == n
        assert t["n_chunks"] == (2 if split and 0 < split < n else 1)
        assert list(t["sizes"]) == [len(p) for p in payloads]
        assert list(t["deltas"]) == [delta] * n
        for o, sz, p in zip(t["offsets"], t["sizes"], payloads):
            assert blob[int(o) : int(o) + int(sz)] == p
        f = mp4.video_features(blob)
        assert f[0] == n and f[15] == 1.0
        assert f[5] == sum(len(p) for p in payloads)


def _rot48(x: int, r: int) -> int:
    m = (1 << 48) - 1
    return ((x << r) & m) | (x >> (48 - r)) if r else x


def test_fingerprint_fold_equals_closed_form():
    """The linearity identity the fingerprint_profile oracle rests on:
    the sequential rotate-XOR fold over a window equals
    XOR_j rot^((w-1-j)*13 mod 48)(h[i+j]) — verified over random
    48-bit hash arrays for several window sizes."""
    rng = random.Random(9)
    for w in (2, 4, 8):
        for _ in range(20):
            n = rng.randint(w, w + 30)
            h = [rng.getrandbits(48) for _ in range(n)]
            # sequential fold (what the numpy kernel computes)
            g = list(h)
            for k in range(1, w):
                g = [(_rot48(g[i], 13) ^ h[i + k]) for i in range(n - k)]
            # closed form (what the DuckDB oracle computes)
            closed = [
                reduce(
                    lambda a, b: a ^ b,
                    [_rot48(h[i + j], ((w - 1 - j) * 13) % 48) for j in range(w)],
                )
                for i in range(n - w + 1)
            ]
            assert g == closed


def test_murmur3_random_longs(spark):
    """Stepwise murmur3_32 on 60 random longs (full signed range)
    matches the C-faithful model byte-for-byte."""
    from imcs_spark.functions.aggregates import MURMUR_SEED, with_murmur3_32
    from test_core import _murmur3_32_model

    rng = random.Random(5)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(60)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.h for r in with_murmur3_32(df, "v", "h").collect()}
    for v in vals:
        assert got[v] == _murmur3_32_model(struct.pack("<q", v), MURMUR_SEED)


def test_pii_ccard_random_contexts(spark):
    """Valid cards redact in any non-digit-glued context; invalid
    look-alikes and digit-glued runs never do; pii_profile's n_ccard
    equals the number of valid standalone spans."""
    from imcs_spark.pipeline import curate

    rng = random.Random(31)
    rows, expect_n = [], []
    for i in range(30):
        base = "".join(rng.choice("0123456789") for _ in range(15))
        card = _luhn_complete(base)
        if rng.random() < 0.4:  # corrupt one digit -> invalid
            pos = rng.randrange(len(card))
            card = card[:pos] + rng.choice(
                [c for c in "0123456789" if c != card[pos]]
            ) + card[pos + 1 :]
        glued = rng.random() < 0.3
        if glued:
            # separator-free so the glued run is ONE 17-digit candidate
            # (interior separators would offer \b cut points and allow
            # sub-span matches); the expected outcome is then simply
            # the Luhn verdict on the whole glued run
            span = "9" + card
            text = f"pay {span} now"
        else:
            sep = rng.choice(["", "-", " "])
            span = sep.join(card[j : j + 4] for j in range(0, 16, 4))
            text = f"pay {span} now"
        rows.append((i, text))
        expect_n.append(1 if _luhn_model("".join(c for c in span if c.isdigit())) else 0)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {r.doc_id: r.n_ccard for r in curate.pii_profile(df).collect()}
    red = {
        r.doc_id: r.red
        for r in df.select("doc_id", curate.redact_pii("text").alias("red")).collect()
    }
    for i, (doc_id, text) in enumerate(rows):
        assert prof[doc_id] == expect_n[i], (text, prof[doc_id])
        if expect_n[i]:
            assert "[CCARD]" in red[doc_id], text
        else:
            assert red[doc_id] == text, (text, red[doc_id])


def test_pii_batch_forms_match_column_forms_on_adversarial_text(spark):
    """Seeded fuzz for the Java-regex vs Python-re dialect parity
    of curate.redact_pii_batch / pii_profile_batch (round 8): texts are
    built from PII-flavored fragments — digit runs with mixed
    separators, @-words, dotted quads, card-ish sequences, replacement
    metacharacters ($, \\), unicode digits/letters, brackets — the
    exact places a dialect divergence would hide. Both batch forms must
    match their Column twins row-for-row."""
    from imcs_spark.pipeline import curate

    rng = random.Random(20260815)
    frags = [
        "555-123-4567", "+1-555-0199", "123-45-6789", "4111-1111-1111-1111",
        "1234-5678-9012-3456", "10.0.0.1", "256.1.1.1", "2001:db8::1",
        "a@b.co", "x.y+z@sub.dom.org", "user@@double", "@nohost",
        "$1", "$0", "\\1", "\\b", "[PHONE]", "[EMAIL]", "$1[PHONE]",
        "۱۲۳-۴۵-۶۷۸۹", "café", "naïve", "一二三",
        "12345678901234567890", "1 2 3 4 5 6 7 8 9 0 1 2 3",
        "3782 822463 10005", "12:30:45", "fe80::", "std::vector<int>",
        "word", "w123", "...", "-", "--", ".", "}{",
        # combining-mark-glued PII (round 9): the JDK treats an Mn mark
        # on a letter/digit base as a word char, so these have NO
        # trailing \b in Java — the exact divergence the lookaround
        # rewrite in curate._py_pat exists to reproduce; plus the
        # other categories where Java and Python \w split
        "123-45-6789́", "́123-45-6789", "10.0.0.1́",
        "4111-1111-1111-1111́", "2001:db8::1̀",
        "á123-45-6789", "_́123-45-6789", " ́ ",
        "123-45-6789ः", "123-45-6789‍", "123-45-6789⁀",
        "123-45-6789²", "123-45-6789Ⅻ", "555-123-4567́̀",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 12)
        texts.append(" ".join(rng.choice(frags) for _ in range(n)))
    # glued variants: no spaces between fragments
    for _ in range(100):
        texts.append("".join(rng.choice(frags) for _ in range(rng.randint(1, 6))))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    red = df.select(
        "doc_id",
        curate.redact_pii("text").alias("a"),
        curate.redact_pii_batch("text").alias("b"),
    ).collect()
    bad = [(r.doc_id, r.a, r.b) for r in red if r.a != r.b]
    assert not bad, bad[:3]

    pa = {r["doc_id"]: r.asDict() for r in curate.pii_profile(df).collect()}
    pb = {r["doc_id"]: r.asDict() for r in curate.pii_profile_batch(df).collect()}
    mism = [k for k in pa if pa[k] != pb[k]]
    assert not mism, [(k, pa[k], pb[k]) for k in mism[:3]]


def test_java_word_boundary_parity(spark):
    """The \\b rewrite in curate._py_pat must reproduce the JDK's
    default word-boundary rule EXACTLY (Pattern.java Bound, no
    UNICODE_CHARACTER_CLASS): word = '_' | isLetterOrDigit | (Mn with a
    letter/digit base through a mark run). Live cross-check: the SSN
    pattern through Spark's JVM regexp_replace vs the rewritten
    regex-module twin, over every Unicode category where engines
    diverge — Mn (glued / bare / on-underscore / run-of-two), Mc, Me,
    Pc, Nl, No, ZWJ/ZWNJ, Cf — in leading, trailing and mid-string
    positions."""
    from pyspark.sql import functions as F

    from imcs_spark.pipeline.curate import PII_PATTERNS, _py_pat

    ssn_java = next(p for name, p, _ in PII_PATTERNS if name == "ssn")
    ssn_py = _py_pat(ssn_java)

    S = "123-45-6789"
    chars = ["́", "̀", "ः", "⃝", "⁀", "‍",
             "‌", "²", "Ⅻ", "_", "q", "7", " ", ".", "-",
             "­", "ͅ", "½", "ʰ", "é"]
    texts = []
    for c in chars:
        texts += [S + c, c + S, f"a{c} {S} {c}b", f"x{c}{S}{c}x",
                  " " + c + S, "a" + c + S, "_" + c + S]
    texts += [S, S + "́̀", "́̀" + S, S + "́" + "1"]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    java = {
        r["i"]: r["r"]
        for r in df.select(
            "i", F.regexp_replace("t", ssn_java, "[SSN]").alias("r")
        ).collect()
    }
    bad = []
    for i, t in enumerate(texts):
        j = "[SSN]" in java[i]
        p = ssn_py.search(t) is not None
        if j != p:
            bad.append((repr(t), j, p))
    assert not bad, bad[:5]


def test_asof_join_property_random(spark):
    """Randomized asof_join vs a direct Python model: every direction,
    strict and tolerant variants, duplicate left timestamps, per-series
    (by=) grouping, and left rows outside the right range. Right
    timestamps are unique per series (duplicate right keys have no
    defined winner in either the reference or pandas merge_asof).
    Complements the golden vectors in test_golden_vectors and the
    direction/tolerance edges in test_scale_joins."""
    from imcs_spark.operators.joins import asof_join

    rng = random.Random(20260815)

    def model_row(x, rts, direction, strict, tol):
        prevs = [t for t in rts if (t < x if strict else t <= x)]
        nexts = [t for t in rts if (t > x if strict else t >= x)]
        prev_t = max(prevs) if prevs else None
        next_t = min(nexts) if nexts else None
        if direction == "backward":
            m = prev_t
        elif direction == "forward":
            m = next_t
        else:  # nearest, ties to backward (x-prev <= next-x)
            if prev_t is None:
                m = next_t
            elif next_t is None:
                m = prev_t
            else:
                m = prev_t if (x - prev_t) <= (next_t - x) else next_t
        if m is not None and tol is not None and abs(x - m) > tol:
            m = None
        return m

    for trial in range(3):
        rows_l, rows_r = [], []
        model_r = {}
        for sid in ("a", "b"):
            rts = sorted(rng.sample(range(0, 200, 2), 12))  # unique, even
            model_r[sid] = rts
            rows_r += [(sid, float(t), float(t) * 10 + trial) for t in rts]
            for _ in range(15):
                # odd, even (exact hits), and out-of-range left keys
                x = rng.choice(
                    [rng.randrange(0, 200), rng.choice(rts), -5, 250]
                )
                rows_l.append((sid, float(x)))
        left = spark.createDataFrame(rows_l, "sid string, ts double")
        right = spark.createDataFrame(rows_r, "sid string, ts double, pay double")

        cases = [("backward", False), ("backward", True),
                 ("forward", False), ("forward", True), ("nearest", False)]
        for direction, strict in cases:
            for tol in (None, 7.0):
                got = asof_join(
                    left, right, on="ts", by=["sid"],
                    direction=direction, strict=strict, tolerance=tol,
                ).collect()
                assert len(got) == len(rows_l)
                counts = {}
                for r in got:
                    counts[(r["sid"], r["ts"])] = counts.get((r["sid"], r["ts"]), 0) + 1
                for r in got:
                    m = model_row(r["ts"], model_r[r["sid"]], direction, strict, tol)
                    want = None if m is None else float(m) * 10 + trial
                    assert r["pay"] == want, (
                        trial, direction, strict, tol, r["sid"], r["ts"], r["pay"], want
                    )
                # duplicate left rows each get their own match
                for (sid, ts), n in counts.items():
                    expect_n = sum(1 for s, x in rows_l if s == sid and x == ts)
                    assert n == expect_n, (sid, ts, n, expect_n)
