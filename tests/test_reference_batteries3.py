"""Golden vectors from the LAST THREE reference pg_regress batteries
that previous rounds had not pinned: sql/windowagg.sql →
expected/windowagg.out (87 lines), sql/groupbyagg.sql →
expected/groupbyagg.out (114 lines), sql/gridagg.sql →
expected/gridagg.out (36 lines) — asserted against the exact values in
the .out files on the sql/create.sql Quote fixture.

The windowagg battery is the load-bearing one: it exposes the C
engine's ZERO-INITIALIZED circular history (IMCS_WINDOW_AGG_DEF,
func.c:1632-1763) — during the first n-1 elements the window is always
n long with zeros in the not-yet-filled slots, so cs_window_min(x,3)
over {10.5,...} starts {0,0,...}, cs_window_avg divides by n even in
warm-up, and var/dev use (Σx² − (Σx)²/n)/n with n = interval. This is
moving_agg(warmup='reference'); the Spark-native partial-window default
(SQL frame semantics) intentionally differs on those warm-up rows.

Fixture columns are float4 (real) like the reference table: several
expected values only reproduce with float32 input rounding (e.g.
30.7000007629395 = 10.5 + float4(20.2)).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from imcs_spark.functions import elementwise as E
from imcs_spark.operators import grouping, positional, windows


@pytest.fixture(scope="module")
def quote(spark):
    # sql/create.sql Quote rows
    rows = [
        ("IBM", "2013-11-01", 10.2, 11.0, 10.0, 10.5, 100),
        ("IBM", "2013-11-02", 20.2, 20.2, 20.2, 20.2, 200),
        ("IBM", "2013-11-04", 30.5, 31.0, 30.0, 30.2, 300),
        ("IBM", "2013-11-05", 40.5, 41.0, 40.0, 40.2, 400),
        ("IBM", "2013-11-06", 50.2, 51.0, 50.0, 50.5, 500),
        ("ABB", "2013-11-03", 60.5, 61.0, 70.0, 60.2, 600),
        ("ABB", "2013-11-06", 70.2, 71.0, 70.0, 70.5, 700),
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, day_s string, open float, high float, low float, close float, volume int",
    ).withColumn("day", F.to_date("day_s")).drop("day_s")
    return df


@pytest.fixture(scope="module")
def ibm(quote):
    """IBM slice as a series frame keeping float4 element type, plus the
    Day column for group keys (Quote_get('IBM') ordered by Day)."""
    w = Window.orderBy("day")
    return (
        quote.filter(F.col("symbol") == "IBM")
        .withColumn("pos", F.row_number().over(w) - 1)
        .select("pos", "day", "high", "low", F.col("close").alias("val"))
    )


def _vals(df, col, pos_col="pos"):
    return [r[col] for r in df.orderBy(pos_col).collect()]


def _approx(got, want, rel=1e-12):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=rel, abs=1e-9), (got, want)


def _approx4(got, want):
    # float4-printed expected values: ~6 significant digits
    _approx(got, want, rel=1e-6)


# --- sql/windowagg.sql vs expected/windowagg.out ---------------------------

WMAX = [10.5, 20.2, 30.2, 40.2, 50.5]
WMIN = [0.0, 0.0, 10.5, 20.2, 30.2]
WSUM = [10.5, 30.7000007629395, 60.9000015258789, 90.6000022888184, 120.900001525879]
WAVG = [3.5, 10.2333335876465, 20.3000005086263, 30.2000007629395, 40.3000005086263]
WVAR = [24.5, 68.0422272915312, 64.6866716512046, 66.6666666666667, 68.6866614786786]
WDEV = [4.94974746830583, 8.24877125949866, 8.04280247495887, 8.16496580927726, 8.28774163923313]


def test_windowagg_reference_warmup(ibm):
    # expected/windowagg.out:1-35 — full-length outputs, zero-padded
    # warm-up (min's leading {0,0} is the smoking gun for the
    # zero-initialized history)
    _approx4(_vals(windows.moving_agg(ibm, "max", 3, "val", warmup="reference"), "window_max"), WMAX)
    _approx4(_vals(windows.moving_agg(ibm, "min", 3, "val", warmup="reference"), "window_min"), WMIN)
    _approx(_vals(windows.moving_agg(ibm, "sum", 3, "val", warmup="reference"), "window_sum"), WSUM)
    _approx(_vals(windows.moving_agg(ibm, "avg", 3, "val", warmup="reference"), "window_avg"), WAVG)
    _approx(_vals(windows.moving_agg(ibm, "var", 3, "val", warmup="reference"), "window_var"), WVAR)
    _approx(_vals(windows.moving_agg(ibm, "dev", 3, "val", warmup="reference"), "window_dev"), WDEV)


def test_windowagg_global_reference_warmup(ibm):
    # moving_agg_global(warmup='reference') must agree with the .out
    # vectors too — head-row recombination is where the padding lives
    for agg, want in [
        ("max", WMAX), ("min", WMIN), ("sum", WSUM),
        ("avg", WAVG), ("var", WVAR), ("dev", WDEV),
    ]:
        got = _vals(
            windows.moving_agg_global(ibm, agg, 3, "val", num_partitions=3, warmup="reference"),
            f"window_{agg}",
        )
        _approx(got, want, rel=1e-6)


def test_windowagg_trim(ibm):
    # expected/windowagg.out:38-72 — cs_limit(x,2) and x << 2 both keep
    # elements from position 2 on (the full-window suffix for n=3)
    lim = positional.limit(
        windows.moving_agg(ibm, "max", 3, "val", warmup="reference"), 2
    )
    _approx4(_vals(lim, "window_max"), [30.2, 40.2, 50.5])
    shifted = positional.cut_head(
        windows.moving_agg(ibm, "min", 3, "val", warmup="reference"), 2
    )
    _approx4(_vals(shifted, "window_min"), [10.5, 20.2, 30.2])
    for agg, want in [
        ("sum", WSUM[2:]), ("avg", WAVG[2:]), ("var", WVAR[2:]), ("dev", WDEV[2:]),
    ]:
        got = positional.cut_head(
            windows.moving_agg(ibm, agg, 3, "val", warmup="reference"), 2
        )
        _approx(_vals(got, f"window_{agg}"), want)


def test_windowagg_ema(ibm):
    # expected/windowagg.out:75-79: e_0 = x_0; e_i = p·x_i + (1−p)·e_{i−1},
    # p = 2/(n+1) = 0.5 for n=3 (func.c:1764-1778)
    got = _vals(windows.ema(ibm, 3, "val"), "ema")
    _approx(got, [10.5, 15.3500003814697, 22.7750005722046, 31.487500667572, 40.993750333786])


def test_windowagg_atr(ibm):
    # expected/windowagg.out:82-86: the composed true-range recipe
    #   cs_maxof(High-Low, cs_concat('float4:{0}',
    #            cs_maxof(cs_abs((High<<1)-Close), cs_abs((Low<<1)-Close))))
    # is elementwise-aligned to: tr_i = max(High_i − Low_i,
    #   |High_i − Close_{i−1}|, |Low_i − Close_{i−1}|), tr_0's lag term 0.
    # All in float4 arithmetic, then the ATR recurrence in double with
    # growing-n warm-up (func.c:1779-1790).
    w = Window.orderBy("pos")
    lagc = F.lag("val").over(w)  # val = Close, float4
    zero = F.lit(0).cast("float")
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.coalesce(F.abs(F.col("high") - lagc), zero),
        F.coalesce(F.abs(F.col("low") - lagc), zero),
    )
    trs = ibm.withColumn("tr", tr).select("pos", "tr")
    _approx(
        _vals(trs, "tr"),
        [1.0, 9.70000076293945, 10.7999992370605, 10.7999992370605, 10.7999992370605],
        rel=1e-6,
    )
    out = positional.cut_head(windows.atr(trs, 3, "tr"), 2)
    _approx(_vals(out, "atr"), [7.16666666666667, 8.37777752346463, 9.18518476132993])


# --- sql/groupbyagg.sql vs expected/groupbyagg.out --------------------------

@pytest.fixture(scope="module")
def ibm_grp(ibm):
    # Day/3 on PostgreSQL day numbers (days since 2000-01-01), C
    # truncating division — groups IBM rows {0,1},{2,3},{4}
    return ibm.withColumn(
        "grp", E._trunc_div(F.datediff(F.col("day"), F.lit("2000-01-01")), 3)
    )


def test_groupbyagg_group(ibm_grp):
    # expected/groupbyagg.out:1-47
    cases = [
        ("max", [20.2, 40.2, 50.5], 1e-6),
        ("min", [10.5, 30.2, 50.5], 1e-6),
        ("sum", [30.7000007629395, 70.4000015258789, 50.5], 1e-12),
        ("avg", [15.3500003814697, 35.2000007629395, 50.5], 1e-12),
        ("var", [23.5225037002565, 25.0, 0.0], 1e-12),
        ("dev", [4.85000038146973, 5.0, 0.0], 1e-12),
        ("first", [10.5, 30.2, 50.5], 1e-6),
        ("last", [20.2, 40.2, 50.5], 1e-6),
    ]
    for agg, want, rel in cases:
        got = _vals(grouping.group_agg(ibm_grp, agg, "grp", "val"), f"group_{agg}")
        _approx(got, want, rel=rel)


def test_groupbyagg_bitwise(spark):
    # expected/groupbyagg.out:49-59 — cs_group_all is bitwise AND per
    # run, cs_group_any bitwise OR; output in the VALUE's type
    vals = [3, 1, 6, 7, 0, 3, 6, 5, 2, 3, 7]
    grps = [1, 1, 1, 2, 2, 3, 3, 4, 5, 5, 5]
    df = spark.createDataFrame(
        [(i, v, g) for i, (v, g) in enumerate(zip(vals, grps))],
        "pos long, val long, grp int",
    )
    got_all = _vals(grouping.group_agg(df, "all", "grp", "val"), "group_all")
    assert [int(x) for x in got_all] == [0, 0, 2, 5, 2]
    df2 = spark.createDataFrame(
        [(i, v, g) for i, (v, g) in enumerate(zip(vals, grps))],
        "pos long, val smallint, grp tinyint",
    )
    got_any = _vals(grouping.group_agg(df2, "any", "grp", "val"), "group_any")
    assert [int(x) for x in got_any] == [7, 7, 7, 5, 7]


def test_groupbyagg_win_group(ibm_grp):
    # expected/groupbyagg.out:61-107 — run-aggregate repeated onto each
    # element; group key cs_week(Day): Sunday-aligned epoch weeks put
    # Nov 1-2 2013 (Fri,Sat) in one run, Nov 4-6 (Mon-Wed) in the next
    wk = ibm_grp.withColumn("wk", E.week(F.col("day")))
    cases = [
        ("max", [20.2, 20.2, 50.5, 50.5, 50.5], 1e-6),
        ("min", [10.5, 10.5, 30.2, 30.2, 30.2], 1e-6),
        ("sum", [30.7000007629395] * 2 + [120.900001525879] * 3, 1e-12),
        ("avg", [15.3500003814697] * 2 + [40.3000005086263] * 3, 1e-12),
        ("var", [23.5225037002565] * 2 + [68.6866614786786] * 3, 1e-12),
        ("dev", [4.85000038146973] * 2 + [8.28774163923313] * 3, 1e-12),
        ("first", [10.5, 10.5, 30.2, 30.2, 30.2], 1e-6),
        ("last", [20.2, 20.2, 50.5, 50.5, 50.5], 1e-6),
    ]
    for agg, want, rel in cases:
        got = _vals(grouping.win_group_agg(wk, agg, "wk", "val"), f"win_group_{agg}")
        _approx(got, want, rel=rel)


def test_groupbyagg_win_group_sum_int(spark):
    # expected/groupbyagg.out:109-113 — int4 input, int8 output
    df = spark.createDataFrame(
        [(i, v, g) for i, (v, g) in enumerate(
            zip(range(1, 11), [1, 1, 1, 2, 2, 3, 3, 3, 3, 4])
        )],
        "pos long, val int, grp int",
    )
    got = _vals(grouping.win_group_agg(df, "sum", "grp", "val"), "win_group_sum")
    assert [int(x) for x in got] == [6, 6, 6, 9, 9, 30, 30, 30, 30, 10]


# --- sql/gridagg.sql vs expected/gridagg.out --------------------------------

def test_gridagg(ibm):
    # expected/gridagg.out — tumbling positional buckets of 2; the last
    # (partial) bucket aggregates over its own count (avg 50.5, var 0),
    # unlike the window warm-up which always divides by n
    cases = [
        ("max", [20.2, 40.2, 50.5], 1e-6),
        ("min", [10.5, 30.2, 50.5], 1e-6),
        ("sum", [30.7000007629395, 70.4000015258789, 50.5], 1e-12),
        ("avg", [15.3500003814697, 35.2000007629395, 50.5], 1e-12),
        ("var", [23.5225037002565, 25.0, 0.0], 1e-12),
        ("dev", [4.85000038146973, 5.0, 0.0], 1e-12),
    ]
    for agg, want, rel in cases:
        got = _vals(grouping.grid_agg(ibm, agg, 2, "val"), f"grid_{agg}")
        _approx(got, want, rel=rel)


# --- sql/hashagg.sql compound-key cases through the cs_cut/cs_as shims ------

def test_hashagg_compound_key_cut(quote, spark):
    # expected/hashagg.out:23-35 ported VERBATIM through the pack/cut
    # shims: cs_hash_sum(Close, (Day%2)||(Volume%10)) then
    # cs_cut(group_by, 'i4i4') → {(1,0): 50.7000007629395,
    # (0,0): 100.900001525879}. Day is the PG day number
    # (days since 2000-01-01); || packs two little-endian int4s.
    from imcs_spark import sources as S
    from imcs_spark.operators import grouping

    ibm = (
        quote.filter(F.col("symbol") == "IBM")
        .withColumn("pgday", F.datediff(F.col("day"), F.lit("2000-01-01")))
        .withColumn(
            "gkey",
            S.pack(("i4", F.col("pgday") % 2), ("i4", F.col("volume") % 10)),
        )
    )
    agged = grouping.hash_agg(
        ibm, {"agg_val": ("sum", "close")}, ["gkey"]
    ).withColumn("k", S.cut("gkey", "i4i4"))
    got = {
        (r["k"]["f0"], r["k"]["f1"]): r["agg_val"] for r in agged.collect()
    }
    assert set(got) == {(1, 0), (0, 0)}
    assert got[(1, 0)] == pytest.approx(50.7000007629395, rel=1e-12)
    assert got[(0, 0)] == pytest.approx(100.900001525879, rel=1e-12)

    # cs_as with the battery's PairOfInt composite (hashagg.sql:7-8)
    pair = agged.withColumn(
        "p", S.as_struct("gkey", [("first", "i4"), ("second", "i4")])
    )
    got2 = {
        (r["p"]["first"], r["p"]["second"]): r["agg_val"]
        for r in pair.collect()
    }
    assert got2 == got

    # cs_as_array over the same packed pair
    arr = agged.withColumn("a", S.as_array("gkey", "i4", 2))
    got3 = {tuple(r["a"]): r["agg_val"] for r in arr.collect()}
    assert got3 == got


def test_cut_pack_round_trip_types(spark):
    # every fixed-width family the format grammar accepts
    # (imcs.c:4830-4904): ints of all four sizes, both floats, fixed
    # chars, PG dates, timestamps, money cents
    from imcs_spark import sources as S

    df = spark.createDataFrame(
        [(1, -7, 300, -70000, 5_000_000_000, 1.5, -2.25, "ab")],
        "pos long, i1 int, i2 int, i4 long, i8 long, f4 double, f8 double, s string",
    ).withColumn(
        "key",
        S.pack(
            ("i1", "i1"), ("i2", "i2"), ("i4", "i4"), ("i8", "i8"),
            ("f4", "f4"), ("f8", "f8"), ("c4", "s"),
        ),
    )
    r = df.select(S.cut("key", "i1i2i4i8f4f8c4").alias("k")).collect()[0]["k"]
    assert (r["f0"], r["f1"], r["f2"], r["f3"]) == (-7, 300, -70000, 5_000_000_000)
    assert r["f4"] == pytest.approx(1.5) and r["f5"] == pytest.approx(-2.25)
    assert r["f6"] == "ab"

    # date/timestamp/money decode from raw packed integers
    import datetime
    from decimal import Decimal

    df2 = spark.createDataFrame([(5053, 125)], "d long, cents long").withColumn(
        "key", S.pack(("i4", "d"), ("m8", "cents"))
    )
    r2 = df2.select(S.cut("key", "d4m8").alias("k")).collect()[0]["k"]
    assert r2["f0"] == datetime.date(2013, 11, 1)  # PG day 5053
    assert r2["f1"] == Decimal("1.25")

    # malformed format / wrong width fail loudly
    with pytest.raises(ValueError, match="invalid int size"):
        S.cut("key", "i3")
    with pytest.raises(ValueError, match="format"):
        S.cut("key", "x4")
    with pytest.raises(Exception, match="bytes"):
        # packed key is 12 bytes (i4 + m8); 'i4i4' needs 8 -> loud error
        df2.select(S.cut("key", "i4i4").alias("k")).collect()


def test_pack_nan_payload_objects_and_multitoken(spark):
    # round-12 ADVICE fixes on the pack() side of the shims:
    # (1) a genuine float NaN is a PAYLOAD — the reference's ``||``
    #     concatenation packs the NaN bytes (func.c:366-412), so the
    #     packed key is non-NULL and cut() round-trips the NaN;
    # (2) date/timestamp/Decimal OBJECTS encode to the same PG-epoch
    #     ints cut() decodes (pack/cut symmetry for d4/T8/m8 tokens);
    # (3) a multi-token format in one pack() part is a loud error, not
    #     a silent first-token mis-pack.
    import datetime
    import math
    from decimal import Decimal

    from imcs_spark import sources as S

    # (1) NaN payload in f8 -> non-NULL key holding the packed NaN
    #     bytes (asserted on the raw bytes: Arrow's pandas bridge reads
    #     a NaN FLOAT back as null on the decode side, so the byte-
    #     level check is the one that pins the pack semantics)
    import struct

    df = spark.createDataFrame(
        [(1, float("nan"), 7), (2, 2.5, None)], "pos long, x double, k int"
    )
    out = df.withColumn("key", S.pack(("f8", "x"), ("i4", "k")))
    rows = {r["pos"]: r for r in out.collect()}
    assert rows[1]["key"] == struct.pack("<di", float("nan"), 7)
    assert math.isnan(struct.unpack("<di", bytes(rows[1]["key"]))[0])
    assert rows[2]["key"] is None  # None in any part -> NULL key

    # (2) typed objects pack to what cut() decodes back
    d = datetime.date(2013, 11, 1)  # PG day 5053
    ts = datetime.datetime(2001, 2, 3, 4, 5, 6, 789000)
    df2 = spark.createDataFrame(
        [(d, ts, Decimal("1.25"))],
        "d date, ts timestamp, m decimal(19,2)",
    ).withColumn("key", S.pack(("d4", "d"), ("T8", "ts"), ("m8", "m")))
    r = df2.select(S.cut("key", "d4T8m8").alias("c")).collect()[0]["c"]
    assert r["f0"] == d
    assert r["f1"] == ts
    assert r["f2"] == Decimal("1.25")

    # (3) multi-token part rejected loudly
    with pytest.raises(ValueError, match="ONE format token"):
        S.pack(("i4i4", "d"))

    # (4) money tokens: a float money VALUE is dollars like Decimal —
    # int(12.34) would pack 12 cents, a silent 100x scale error
    # (round-12 review finding); sub-cent Decimals round, not truncate
    df3 = spark.createDataFrame(
        [(12.34, Decimal("0.005"))], "f double, d decimal(19,3)"
    ).withColumn("key", S.pack(("m8", "f"), ("m8", "d")))
    r3 = df3.select(S.cut("key", "m8m8").alias("c")).collect()[0]["c"]
    assert r3["f0"] == Decimal("12.34")
    assert r3["f1"] in (Decimal("0.00"), Decimal("0.01"))  # half-even


def test_reference_warmup_randomized_model(spark):
    # randomized cross-check of warmup='reference' against a direct
    # numpy zero-padded-history model (func.c:1632-1763), per-series
    # AND global paths, negative values included (they exercise the
    # max-side zero padding the battery's positive fixture cannot)
    import numpy as np

    rng = np.random.RandomState(7)
    vals = np.round(rng.uniform(-50, 50, 40), 3)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "pos long, val double"
    )

    def model(agg, n):
        out = []
        hist = np.zeros(n)
        for i, v in enumerate(vals):
            hist[i % n] = v
            if agg == "min":
                out.append(hist.min())
            elif agg == "max":
                out.append(hist.max())
            elif agg == "sum":
                out.append(hist.sum())
            elif agg == "avg":
                out.append(hist.sum() / n)
            elif agg == "var":
                out.append((np.square(hist).sum() - hist.sum() ** 2 / n) / n)
            else:  # dev
                out.append(
                    np.sqrt((np.square(hist).sum() - hist.sum() ** 2 / n) / n)
                )
        return out

    for n in (1, 2, 5, 7):
        for agg in ("min", "max", "sum", "avg", "var", "dev"):
            want = model(agg, n)
            got = _vals(
                windows.moving_agg(df, agg, n, "val", warmup="reference"),
                f"window_{agg}",
            )
            _approx(got, want, rel=1e-9)
            got_g = _vals(
                windows.moving_agg_global(
                    df, agg, n, "val", num_partitions=4, warmup="reference"
                ),
                f"window_{agg}",
            )
            _approx(got_g, want, rel=1e-9)


# --- sql/drop.sql vs expected/drop.out (lifecycle battery, 16/16) -----------

def test_drop_battery_lifecycle(quote, spark):
    """sql/drop.sql ported verbatim against expected/drop.out — the
    16th and final pg_regress file. The reference's one-timestamp
    delete form is a HEAD TRIM (imcs--1.1.sql:188:
    TABLE_delete(id, till_ts) => TABLE_delete(id, null, till_ts)), so
    Quote_delete('IBM', '02-Nov-2013') removes the 01-Nov and 02-Nov
    rows — in this API that is delete('IBM', till_ts=...), NOT a
    positional second argument (which is from_ts). Deleted-row counts
    (the battery's scalar outputs) are pinned as count deltas; the
    drop-adjacent error paths (access-after-drop, double-drop,
    re-create-after-drop) are pinned on Engine: drop is IDEMPOTENT here
    (dict pop; PostgreSQL's function-drop errors instead — divergence
    by design, a catalog no-op beats a spurious failure on replayed
    cleanup scripts), access after drop raises KeyError, and re-create
    after drop works."""
    import datetime

    from imcs_spark.table import Engine

    eng = Engine(spark)
    t = eng.create("Quote", quote, ts_col="day", id_col="symbol")

    # Quote_delete('IBM', date('02-Nov-2013')) -> 2  (head trim)
    n0 = t.count("IBM")
    t1 = t.delete("IBM", till_ts="2013-11-02")
    assert n0 - t1.count("IBM") == 2
    # select Day from Quote_get('IBM') -> {11-04, 11-05, 11-06}
    days = [r["day"] for r in t1.get("IBM").orderBy("day").collect()]
    assert days == [
        datetime.date(2013, 11, 4),
        datetime.date(2013, 11, 5),
        datetime.date(2013, 11, 6),
    ]

    # Quote_delete('ABB', 03-Nov, 06-Nov) -> 2  (inclusive range)
    n0 = t1.count("ABB")
    t2 = t1.delete("ABB", from_ts="2013-11-03", till_ts="2013-11-06")
    assert n0 - t2.count("ABB") == 2

    # Quote_truncate() -> empty table, both gets return 0 rows with the
    # full schema intact
    t3 = t2.truncate()
    assert t3.count("IBM") == 0 and t3.count("ABB") == 0
    assert t3.get("IBM").count() == 0 and t3.get("ABB").count() == 0
    assert t3.get("IBM").columns == t2.get("IBM").columns

    # CrashLog_delete('2014-04-14 11:54','...11:56') -> 3 (timestamp
    # range over the id-less create.sql CrashLog fixture)
    crash = spark.createDataFrame(
        [
            ("2014-04-14 11:54:00", 10000001, "USA"),
            ("2014-04-14 11:55:00", 10000002, "Japan"),
            ("2014-04-14 11:56:00", 10000003, "China"),
        ],
        "ts_s string, crash_id long, country string",
    ).withColumn("log_time", F.to_timestamp("ts_s")).drop("ts_s")
    cl = eng.create("CrashLog", crash, ts_col="log_time")
    n0 = cl.count()
    cl2 = cl.delete(from_ts="2014-04-14 11:54", till_ts="2014-04-14 11:56")
    assert n0 - cl2.count() == 3

    # Quote_drop(); CrashLog_drop() — then the error paths
    assert eng.is_loaded("Quote") and eng.is_loaded("CrashLog")
    eng.drop("Quote")
    eng.drop("CrashLog")
    assert not eng.is_loaded("Quote") and not eng.is_loaded("CrashLog")
    with pytest.raises(KeyError):
        eng.tables["Quote"]  # access-after-drop fails loudly
    eng.drop("Quote")  # double-drop: idempotent no-op (pinned)
    # re-create-after-drop works and reads fresh data
    t4 = eng.create("Quote", quote, ts_col="day", id_col="symbol")
    assert t4.count("IBM") == 5
