"""The reference's flagship NYSE-quote workload (example.sql /
user_guide "Performance comparison") reproduced end-to-end through the
engine API:

  1. Quote_load + Quote_get('IBM', range)     → Engine.create + get
  2. VWAP: select cs_wavg(Volume, Close)      → aggregates.wavg
  3. VWAP all symbols (view over Quote_get)   → groupBy + wavg
  4. Quote_project(..., cs_filter_pos(Close > Open*1.01))
                                              → filter_pos + project
  5. moving averages / EMA over Close         → windows.moving_agg/ema
  6. Quote_concat(array(ids))                 → TsTable.concat + sum
"""

import datetime

import pytest
from pyspark.sql import functions as F

from imcs_spark import Engine
from imcs_spark.functions import aggregates as agg
from imcs_spark.operators import positional, windows


ROWS = []
# deterministic two-symbol synthetic quote history, 60 days each
for sym, base in (("IBM", 100.0), ("ABB", 50.0)):
    price = base
    for d in range(60):
        day = datetime.date(2013, 1, 1) + datetime.timedelta(days=d)
        drift = ((d * 7919 + (13 if sym == "IBM" else 17)) % 11 - 5) / 10.0
        o = price
        c = price + drift
        ROWS.append((sym, day, o, max(o, c) + 0.5, min(o, c) - 0.5, c, 100 + d))
        price = c
SCHEMA = "symbol string, day date, open double, high double, low double, close double, volume int"


@pytest.fixture(scope="module")
def quotes(spark):
    eng = Engine(spark)
    return eng.create("quote", spark.createDataFrame(ROWS, SCHEMA), "day", "symbol")


def _pyrows(sym=None, lo=None, hi=None):
    out = [r for r in ROWS if (sym is None or r[0] == sym)]
    if lo:
        out = [r for r in out if r[1] >= lo]
    if hi:
        out = [r for r in out if r[1] <= hi]
    return out


def test_vwap_single_symbol_slice(quotes):
    lo, hi = datetime.date(2013, 1, 10), datetime.date(2013, 2, 10)
    got = (
        quotes.get("IBM", lo, hi)
        .agg(agg.wavg("volume", "close").alias("vwap"))
        .collect()[0]["vwap"]
    )
    rows = _pyrows("IBM", lo, hi)
    expect = sum(r[6] * r[5] for r in rows) / sum(r[6] for r in rows)
    assert got == pytest.approx(expect)


def test_vwap_all_symbols(quotes):
    got = {
        r["symbol"]: r["vwap"]
        for r in quotes.df()
        .groupBy("symbol")
        .agg(agg.wavg("volume", "close").alias("vwap"))
        .collect()
    }
    for sym in ("IBM", "ABB"):
        rows = _pyrows(sym)
        expect = sum(r[6] * r[5] for r in rows) / sum(r[6] for r in rows)
        assert got[sym] == pytest.approx(expect), sym


def test_filter_project_positions(quotes):
    """Quote_project(Quote_get(...), cs_filter_pos(Close > Open*1.01))."""
    posed = quotes.with_pos().filter(F.col("symbol") == "IBM")
    positions = positional.filter_pos(
        posed, F.col("close") > F.col("open") * 1.001, ["symbol"]
    ).select(F.col("val").alias("pos"))
    out = quotes.project(["open", "close"], positions).filter(
        F.col("symbol") == "IBM"
    )
    got = [(r["open"], r["close"]) for r in out.collect()]
    expect = [(r[2], r[5]) for r in _pyrows("IBM") if r[5] > r[2] * 1.001]
    assert got == [tuple(map(pytest.approx, e)) for e in expect]


def test_moving_and_ema_close(quotes):
    posed = quotes.with_pos()
    m = windows.moving_agg(posed, "avg", 5, "close", ["symbol"], "sma5")
    e = windows.ema(posed.select("symbol", "pos", "close"), 5, "close", ["symbol"])
    sma = {
        (r["symbol"], r["pos"]): r["sma5"] for r in m.collect()
    }
    closes = [r[5] for r in _pyrows("IBM")]
    for i in (0, 3, 20, 59):
        expect = sum(closes[max(0, i - 4) : i + 1]) / len(closes[max(0, i - 4) : i + 1])
        assert sma[("IBM", i)] == pytest.approx(expect), i
    ema_got = {(r["symbol"], r["pos"]): r["ema"] for r in e.collect()}
    p = 2.0 / 6
    acc = closes[0]
    for i, c in enumerate(closes):
        if i > 0:
            acc = c * p + acc * (1 - p)
        assert ema_got[("IBM", i)] == pytest.approx(acc), i


def test_concat_symbols_sum(quotes):
    """cs_sum(Close) over Quote_concat(array('IBM','ABB'))."""
    cat = quotes.concat(["IBM", "ABB"])
    got = cat.agg(agg.sum("close").alias("s")).collect()[0]["s"]
    assert got == pytest.approx(sum(r[5] for r in ROWS))
    assert cat.count() == len(ROWS)
