"""Core layer: session, positional spine, table surface, grand aggs."""

import datetime

import pytest
from pyspark.sql import functions as F

from imcs_spark import Engine, OutOfOrderAppendError, seq, with_pos, zip_with_global_pos
from imcs_spark.functions import aggregates as agg

from conftest import assert_seq


QUOTE_ROWS = [
    ("IBM", datetime.date(2013, 11, 1), 10.2, 11.0, 10.0, 10.5, 100),
    ("IBM", datetime.date(2013, 11, 2), 20.2, 20.2, 20.2, 20.2, 200),
    ("IBM", datetime.date(2013, 11, 4), 30.5, 31.0, 30.0, 30.2, 300),
    ("IBM", datetime.date(2013, 11, 5), 40.5, 41.0, 40.0, 40.2, 400),
    ("IBM", datetime.date(2013, 11, 6), 50.2, 51.0, 50.0, 50.5, 500),
    ("ABB", datetime.date(2013, 11, 3), 60.5, 61.0, 70.0, 60.2, 600),
    ("ABB", datetime.date(2013, 11, 6), 70.2, 71.0, 70.0, 70.5, 700),
]
QUOTE_SCHEMA = "symbol string, day date, open double, high double, low double, close double, volume int"


@pytest.fixture(scope="module")
def quote(spark):
    eng = Engine(spark)
    return eng.create("quote", spark.createDataFrame(QUOTE_ROWS, QUOTE_SCHEMA), "day", "symbol")


def test_seq_literal(spark):
    s = seq(spark, [1, 2, 3], "int")
    assert_seq(s, [1, 2, 3])


def test_with_pos_per_series(quote):
    posed = quote.with_pos()
    got = {
        (r["symbol"], r["pos"]): r["volume"]
        for r in posed.select("symbol", "pos", "volume").collect()
    }
    assert got[("IBM", 0)] == 100 and got[("IBM", 4)] == 500
    assert got[("ABB", 0)] == 600 and got[("ABB", 1)] == 700


def test_global_pos_scalable(spark):
    df = spark.range(0, 1000).select((F.lit(999) - F.col("id")).alias("v"))
    out = zip_with_global_pos(df, ["v"], num_partitions=7)
    rows = out.orderBy("pos").select("v").collect()
    assert [r["v"] for r in rows[:3]] == [0, 1, 2]
    assert rows[-1]["v"] == 999
    assert out.count() == 1000


def test_table_get_span_first_last_count(quote):
    assert quote.count("IBM") == 5
    sliced = quote.get("IBM", datetime.date(2013, 11, 2), datetime.date(2013, 11, 5))
    assert sliced.count() == 3
    assert quote.first("IBM").collect()[0]["first"] == datetime.date(2013, 11, 1)
    assert quote.last("ABB").collect()[0]["last"] == datetime.date(2013, 11, 6)
    sp = quote.span("IBM", 1, 3)
    assert [r["volume"] for r in sp.orderBy("pos").collect()] == [200, 300, 400]
    sp_neg = quote.span("IBM", -2)
    assert [r["volume"] for r in sp_neg.orderBy("pos").collect()] == [400, 500]


def test_grand_aggs_vwap(quote):
    ibm = quote.get("IBM")
    row = ibm.agg(
        agg.wavg("volume", "close").alias("vwap"),
        agg.sum("volume").alias("s"),
        agg.var("close").alias("v"),
        agg.prd(F.col("volume") / 100).alias("p"),
    ).collect()[0]
    closes = [10.5, 20.2, 30.2, 40.2, 50.5]
    vols = [100, 200, 300, 400, 500]
    assert row["vwap"] == pytest.approx(
        sum(c * v for c, v in zip(closes, vols)) / sum(vols)
    )
    assert row["s"] == 1500
    mean = sum(closes) / 5
    assert row["v"] == pytest.approx(sum((c - mean) ** 2 for c in closes) / 5)
    assert row["p"] == pytest.approx(1 * 2 * 3 * 4 * 5)


def test_append_ordering(quote, spark):
    ok = spark.createDataFrame(
        [("IBM", datetime.date(2013, 11, 7), 1.0, 1.0, 1.0, 1.0, 1)], QUOTE_SCHEMA
    )
    t2 = quote.append(ok)
    assert t2.count("IBM") == 6
    bad = spark.createDataFrame(
        [("IBM", datetime.date(2013, 10, 1), 1.0, 1.0, 1.0, 1.0, 1)], QUOTE_SCHEMA
    )
    with pytest.raises(OutOfOrderAppendError):
        quote.append(bad)


def test_delete_range(quote):
    t2 = quote.delete("IBM", till_ts=datetime.date(2013, 11, 2))
    assert t2.count("IBM") == 3
    assert t2.count("ABB") == 2


def test_project_positions(quote, spark):
    positions = seq(spark, [0, 2], "long").select(F.col("val").alias("pos"))
    out = quote.project(["close"], positions).filter(F.col("symbol") == "IBM")
    assert [r["close"] for r in out.collect()] == [10.5, 30.2]


def test_empty_and_table_join(quote, spark):
    assert not quote.empty("IBM")
    assert quote.truncate().empty()
    probe = spark.createDataFrame(
        [("IBM", datetime.date(2013, 11, 3))], "symbol string, day date"
    )
    # preceding: last stored day <= probe day (2013-11-02)
    out = quote.join(probe, direction=-1, right_cols=["close", "volume"])
    row = out.collect()[0]
    assert row["volume"] == 200
    # succeeding: first stored day >= probe day (2013-11-04)
    out2 = quote.join(probe, direction=1, right_cols=["volume"])
    assert out2.collect()[0]["volume"] == 300


def test_versioned_save_open(quote, spark, tmp_path):
    base = str(tmp_path / "quote_store")
    saved = quote.save(base)
    assert saved.count("IBM") == 5
    reopened = type(quote).open(spark, "quote", base)
    assert reopened.count("IBM") == 5
    # append + save produces a new version; old reader handle still valid
    new = reopened.append(
        spark.createDataFrame(
            [("IBM", datetime.date(2013, 11, 8), 1.0, 1.0, 1.0, 1.0, 1)], QUOTE_SCHEMA
        )
    ).save(base)
    assert type(quote).open(spark, "quote", base).count("IBM") == 6
    assert saved.count("IBM") == 5  # old snapshot untouched


def _murmur3_32_model(data: bytes, seed: int) -> int:
    """Literal Python transcription of the reference murmur_hash3_32
    (func.c:4807-4860); validated against the canonical public vector
    murmur3_32('hello', seed 0) = 0x248bfa47 in
    test_murmur3_32_column_matches_model."""

    def rotl32(x, r):
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed
    for i in range(len(data) // 4):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = rotl32(k1, 15)
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
        h1 = rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[len(data) // 4 * 4 :]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = rotl32(k1, 15)
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def test_murmur3_32_column_matches_model(spark):
    """The ANSI-safe split-multiply Column chain must be bit-identical
    to the C algorithm for 8-byte little-endian longs, across sign and
    range extremes; the model itself is pinned to the canonical public
    murmur3 vector."""
    import struct

    from imcs_spark.functions.aggregates import MURMUR_SEED, murmur3_32_long

    assert _murmur3_32_model(b"hello", 0) == 0x248BFA47
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 123456789, -987654321012345, 42]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r.h for r in df.select(murmur3_32_long("v").alias("h")).collect()]
    exp = [_murmur3_32_model(struct.pack("<q", v), MURMUR_SEED) for v in vals]
    assert got == exp


def test_approxdc_hll128_matches_python_model(spark, sf_dir):
    """The declarative m=128 HLL must equal a literal Python
    transcription of the reference estimator (func.c:4865-4924) fed
    the same murmur3_32 hashes — exact equality, not tolerance."""
    import math
    import struct

    from imcs_spark.functions import aggregates as A

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    got = A.approxdc_hll128(li, "l_orderkey").collect()[0]["approxdc"]

    hashes = [
        _murmur3_32_model(struct.pack("<q", r["l_orderkey"]), A.MURMUR_SEED)
        for r in li.collect()
    ]
    m, regs = 128, [0] * 128
    for h in hashes:
        j = h >> 25
        zb = 1
        while (h & 1) == 0 and zb <= 25:
            h >>= 1
            zb += 1
        regs[j] = max(regs[j], zb)
    alpha = 0.7213 / (1 + 1.079 / m)
    c = sum(2.0 ** -r for r in regs)
    e = alpha * m * m / c
    if e <= 2.5 * m:
        v = regs.count(0)
        if v > 0:
            e = m * math.log(m / v)
    elif e > (2**32 - 1) / 30.0:
        e = -(2**32 - 1) * math.log(1 - e / (2**32 - 1))
    assert got == int(e)

    exact = li.distinct().count()
    assert abs(got - exact) <= 0.25 * exact  # m=128 → rse ~9.2%


def test_engine_create_csv_json_sources(spark, tmp_path):
    """Engine.create ingests CSV (header or explicit DDL schema) and
    JSON-lines sources into the same TsTable surface; unsupported
    formats and missing ts columns fail loudly."""
    import json

    import pytest

    from imcs_spark.table import Engine

    csv = tmp_path / "t.csv"
    csv.write_text("id,ts,value\na,1,1.5\na,2,2.5\nb,1,9.0\n")
    jl = tmp_path / "t.jsonl"
    jl.write_text(
        "\n".join(json.dumps({"id": "a", "ts": i, "value": float(i)}) for i in range(4))
    )
    eng = Engine(spark)
    t1 = eng.create("c1", str(csv), "ts", "id", format="csv")
    assert t1.count() == 3 and t1.count("a") == 2
    t2 = eng.create(
        "c2", str(csv), "ts", "id", format="csv",
        schema="id string, ts long, value double",
    )
    assert [r.ts for r in t2.get("b").collect()] == [1]
    t3 = eng.create("j1", str(jl), "ts", "id", format="json")
    assert t3.count() == 4
    # one-time ingest -> versioned parquet layout round trip
    saved = t3.save(str(tmp_path / "landed"))
    assert saved.count() == 4
    # ORC: the other native columnar reader (round 10) — written from
    # the CSV table's frame, read back through the same surface
    orc = tmp_path / "t.orc"
    t1.df().write.orc(str(orc))
    t4 = eng.create("o1", str(orc), "ts", "id", format="orc")
    assert t4.count() == 3 and t4.count("a") == 2
    assert [r.ts for r in t4.get("b").collect()] == [1]
    with pytest.raises(ValueError, match="unsupported format"):
        eng.create("x", str(csv), "ts", format="xml")
    with pytest.raises(ValueError, match="not in source columns"):
        eng.create("y", str(csv), "nope", format="csv")


def test_span_negative_multi_series(spark):
    """span(None, -k) on a multi-series table resolves negatives
    against EACH series' length (pos is per-series), not the global
    row count."""
    from imcs_spark.table import TsTable

    rows = [(u, t, float(u * 100 + t)) for u in (1, 2) for t in range(10)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    t = TsTable(spark, "ms", df, "ts", "user_id")
    out = t.span(None, -3).collect()
    got = {(r.user_id, r.ts) for r in out}
    assert got == {(u, t) for u in (1, 2) for t in (7, 8, 9)}, got
    # single-series selection still resolves against that series
    out = t.span(1, -2).collect()
    assert {(r.user_id, r.ts) for r in out} == {(1, 8), (1, 9)}


def test_get_limit_is_time_ordered(spark):
    from imcs_spark.table import TsTable

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "ts long, value double").repartition(8)
    t = TsTable(spark, "lim", df, "ts")
    got = sorted(r.ts for r in t.get(limit=5).collect())
    assert got == [0, 1, 2, 3, 4], got


def test_save_open_preserves_tiebreak(spark, tmp_path):
    from imcs_spark.table import TsTable

    rows = [(1, 10, 100, 1.0), (1, 10, 99, 2.0), (1, 11, 98, 3.0)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    t = TsTable(spark, "tb", df, "ts", "user_id", tiebreak=("event_id",))
    saved = t.save(str(tmp_path / "store"))
    reopened = TsTable.open(spark, "tb", str(tmp_path / "store"))
    assert reopened.tiebreak == ("event_id",)
    # equal-ts rows keep deterministic positions after the round trip
    pos = {(r.event_id): r.pos for r in reopened.with_pos().collect()}
    assert pos == {99: 0, 100: 1, 98: 2}


def test_readme_quickstart_runs(spark, tmp_path):
    """The README's quickstart porting example must stay executable
    verbatim (modulo the data path): create-from-parquet, time-sliced
    VWAP, filtered count, and the registered cs_* SQL surface."""
    import datetime as dt

    from imcs_spark.sqlsurface import register_sql, register_views

    rows = [
        ("IBM", dt.date(2010, 1, 2) + dt.timedelta(days=7 * i),
         100.0 + i, 101.0 + 1.1 * i, 1000.0 + i)
        for i in range(30)
    ] + [
        ("MSFT", dt.date(2010, 1, 2) + dt.timedelta(days=7 * i),
         50.0 + i, 50.5 + i, 500.0 + i)
        for i in range(30)
    ]
    src = str(tmp_path / "quotes.parquet")
    spark.createDataFrame(
        rows, "symbol string, day date, open double, close double, volume double"
    ).write.parquet(src)

    eng = Engine(spark)
    q = eng.create("quote", src, ts_col="day", id_col="symbol")

    vwap = (
        q.get("IBM", "2010-01-01", "2012-12-31")
        .agg((F.sum(F.col("close") * F.col("volume")) / F.sum("volume")).alias("vwap"))
        .collect()[0]["vwap"]
    )
    assert vwap > 0

    n = (
        q.get("IBM", "2010-01-01", "2010-03-31")
        .filter(F.col("close") > F.col("open") * 1.01)
        .count()
    )
    # 13 weekly IBM rows fall in Q1 2010; close > open*1.01 iff
    # 101 + 1.1i > 101 + 1.01i, strict for i >= 1 -> 12 rows
    assert n == 12

    register_sql(spark)
    register_views(spark, quote_sql=q.df())
    out = spark.sql(
        """
      SELECT symbol, cs_wavg(CAST(volume AS DOUBLE), close) AS vwap
      FROM quote_sql GROUP BY symbol
    """
    ).collect()
    got = {r["symbol"]: r["vwap"] for r in out}
    assert set(got) == {"IBM", "MSFT"} and all(v > 0 for v in got.values())
    eng.drop("quote")
