"""Golden vectors ported from the reference's remaining pg_regress
batteries: sql/math.sql, sql/scalarop.sql, sql/datetime.sql and the
money vectors of sql/transform.sql:26-29, asserted against the exact
values in expected/{math,scalarop,datetime,transform}.out.

The Quote fixture mirrors sql/create.sql: float4 (real) price columns —
several expected values (e.g. sqrt((Open-Close)^2) = 0.300000190734863)
only reproduce when the inputs carry float32 rounding before the double
math, so the schema uses `float`, not `double`.
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from imcs_spark import sources
from imcs_spark.functions import aggregates as A
from imcs_spark.functions import elementwise as E


@pytest.fixture(scope="module")
def quote(spark):
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


def _ibm(quote, expr, name="v"):
    out = (
        quote.filter(F.col("symbol") == "IBM")
        .orderBy("day")
        .select(expr.alias(name))
        .collect()
    )
    return [r[name] for r in out]


# --- sql/math.sql vs expected/math.out --------------------------------------
def test_math_sqrt_pow(quote):
    got = _ibm(quote, E.sqrt(F.pow(F.col("open") - F.col("close"), 2.0)))
    exp = [0.300000190734863, 0, 0.299999237060547, 0.299999237060547, 0.299999237060547]
    assert got == pytest.approx(exp, rel=1e-12, abs=1e-12)


def test_math_sin_cos_identity(quote):
    got = _ibm(
        quote,
        E.sin("open") * E.sin("open") + E.cos("open") * E.cos("open"),
    )
    assert got == pytest.approx([1.0] * 5, rel=1e-12)


def test_math_inverse_trig(quote):
    atan_exp = [1.07522203923062, 1.35044484140069, -1.21592577295848,
                -0.640703733727859, 0.234517542563308]
    asin_exp = [-1.07522203923062, 1.35044484140069, -1.21592577295848,
                0.640703733727859, 0.234517542563308]
    acos_exp = [2.06637061435917, 1.35044484140069, 1.21592577295848,
                2.50088891986193, 0.234517542563308]
    assert _ibm(quote, E.atan(E.tan("close"))) == pytest.approx(atan_exp, rel=1e-12)
    assert _ibm(quote, E.asin(E.sin("close"))) == pytest.approx(asin_exp, rel=1e-12)
    assert _ibm(quote, E.acos(E.cos("close"))) == pytest.approx(acos_exp, rel=1e-12)


def test_math_log_exp(quote):
    # the reference's per-type macro fan-out divides float4/float4 IN
    # float4 (IMCS_FUNC_DECL); Spark promotes to double, so the test
    # reproduces the float32 intermediate explicitly
    ratio1 = (F.col("close") / F.col("open")).cast("float")
    ratio2 = (F.col("open") / F.col("close")).cast("float")
    got = _ibm(quote, E.log(E.exp(ratio1)) - ratio2)
    exp = [0.0579832196235657, 0, -0.0197697281837463,
           -0.0148699879646301, 0.0119166374206543]
    assert got == pytest.approx(exp, rel=1e-9, abs=1e-9)


def test_math_isnan(spark):
    s = sources.parse(spark, "float8:{-1,0,1}")
    out = s.orderBy("pos").select(
        E.isnan(E.div("val", F.lit(0.0))).cast("int").alias("n")
    ).collect()
    assert [r["n"] for r in out] == [0, 1, 0]  # ±inf are not NaN


# --- sql/scalarop.sql vs expected/scalarop.out ------------------------------
def test_scalarop_binary_aggs(quote):
    ibm = quote.filter(F.col("symbol") == "IBM")
    row = ibm.agg(
        A.wsum("volume", "close").alias("wsum"),
        A.wavg("volume", "close").alias("wavg"),
        A.corr("high", "low").alias("corr"),
        A.cov("high", "low").alias("cov"),
    ).collect()[0]
    assert row["wsum"] == pytest.approx(55480.0006866455, rel=1e-12)
    # reference accumulates the weighted mean slightly differently
    # (float4-input instantiation) — agree to 1e-8 relative
    assert row["wavg"] == pytest.approx(36.9866668294271, rel=1e-7)
    assert row["corr"] == pytest.approx(0.999654253859527, rel=1e-9)
    assert row["cov"] == pytest.approx(201.174396875, rel=1e-9)


# --- sql/datetime.sql vs expected/datetime.out ------------------------------
def test_datetime_parts(quote):
    abb = quote.filter(F.col("symbol") == "ABB").orderBy("day")
    row = abb.select(
        E.year("day").alias("y"),
        E.month("day").alias("m"),
        E.mday("day").alias("d"),
        E.wday("day").alias("w"),
        E.week("day").alias("wk"),
        E.quarter("day").alias("q"),
    ).collect()
    assert [r["y"] for r in row] == [2013, 2013]
    assert [r["m"] for r in row] == [11, 11]
    assert [r["d"] for r in row] == [3, 6]
    assert [r["w"] for r in row] == [0, 3]  # 0=Sunday (reference j2day)
    assert [r["wk"] for r in row] == [722, 722]  # weeks since 2000-01-01
    assert [r["q"] for r in row] == [4, 4]


def test_datetime_parts_on_timestamp(quote):
    abb = quote.filter(F.col("symbol") == "ABB").orderBy("day")
    ts = E.cast("day", "timestamp")
    row = abb.select(
        E.year(ts).alias("y"),
        E.mday(ts).alias("d"),
        E.wday(ts).alias("w"),
        E.week(F.to_date(ts)).alias("wk"),
        E.hour(ts).alias("h"),
        E.minute(ts).alias("mi"),
        E.second(ts).alias("s"),
    ).collect()
    assert [r["y"] for r in row] == [2013, 2013]
    assert [r["d"] for r in row] == [3, 6]
    assert [r["w"] for r in row] == [0, 3]
    assert [r["wk"] for r in row] == [722, 722]
    assert [(r["h"], r["mi"], r["s"]) for r in row] == [(0, 0, 0)] * 2


def test_datetime_casts(spark):
    from imcs_spark.series import const_series

    ts = const_series(spark, "2013-10-11 10:00:00", 1, "timestamp")
    row = ts.select(
        E.cast("val", "date").alias("d"),
        E.year("val").alias("y"),
    ).collect()[0]
    assert str(row["d"]) == "2013-10-11" and row["y"] == 2013
    d = const_series(spark, "2013-10-11", 1, "date")
    row = d.select(E.cast("val", "timestamp").alias("t")).collect()[0]
    assert str(row["t"]) == "2013-10-11 00:00:00"


def test_week_pre_2000_truncates_toward_zero(spark):
    """Negative epoch-weeks: the reference divides (days - wday)/7 with
    C integer division (truncation toward zero, imcs.c:5311-5314) —
    floor division would differ on the partial week just before 2000."""
    from datetime import date as pydate

    days = ["1999-12-31", "1999-12-25", "1995-01-01", "1969-07-20", "2000-01-02"]

    def model(s):
        d = pydate.fromisoformat(s)
        delta = (d - pydate(2000, 1, 1)).days
        wday = (d.weekday() + 1) % 7  # 0=Sunday
        shifted = delta - wday
        q = abs(shifted) // 7
        return -q if shifted < 0 else q

    df = spark.createDataFrame([(s,) for s in days], "s string").withColumn(
        "d", F.to_date("s")
    )
    got = {r["s"]: r["wk"] for r in df.select("s", E.week("d").alias("wk")).collect()}
    for s in days:
        assert got[s] == model(s), s
    assert got["1999-12-31"] == 0  # partial week before 2000 truncates to 0
    assert got["1999-12-25"] == -1


# --- sql/transform.sql:26-29 money vectors vs expected/transform.out --------
def test_money_parse_and_arithmetic(spark):
    s = sources.parse(spark, 'money:{100.99,99.01,"$1,000,000"}')
    got = [r["val"] for r in s.orderBy("pos").collect()]
    assert got == [Decimal("100.99"), Decimal("99.01"), Decimal("1000000.00")]

    doubled = s.select((F.col("val") * 2).cast("decimal(19,2)").alias("val"))
    assert sorted(r["val"] for r in doubled.collect()) == [
        Decimal("198.02"), Decimal("201.98"), Decimal("2000000.00")
    ]

    f4 = sources.parse(spark, "float4:{100.99,99.01,1000000}")
    as_money = f4.select(E.to_money("val").alias("val"))
    assert sorted(r["val"] for r in as_money.collect()) == [
        Decimal("99.01"), Decimal("100.99"), Decimal("1000000.00")
    ]

    back = s.select(E.cast("val", "double").alias("val"))
    assert sorted(r["val"] for r in back.collect()) == [99.01, 100.99, 1000000.0]

    cents = s.select(E.money_to_cents("val").alias("c"))
    assert sorted(r["c"] for r in cents.collect()) == [9901, 10099, 100000000]
