"""Golden vectors ported from the reference pg_regress batteries that
round 9 found UNCITED in the test suite: sql/operators.sql (the full
operator-sugar surface: arithmetic, comparisons, bitwise/logical,
filter `?`, wsum `+*` / wavg `//` / corr `~`, shifts `<<`/`>>`,
mixed scalar/series arithmetic), sql/cumagg.sql, sql/grandagg.sql,
sql/hashagg.sql and sql/span.sql — asserted against the exact values
in expected/{operators,cumagg,grandagg,hashagg,span}.out.

Same fixture convention as test_reference_batteries.py: float4 (real)
price columns, because several expected values only reproduce when the
inputs carry float32 rounding before the double math. The reference
prints float4 results at ~6 significant digits and float8 at ~15, so
the assertions use matching tolerances.
"""

import pytest
from pyspark.sql import functions as F

from imcs_spark import sources
from imcs_spark.functions import aggregates as A
from imcs_spark.functions import elementwise as E
from imcs_spark.operators import grouping, positional, timeseries, windows


@pytest.fixture(scope="module")
def quote(spark):
    # sql/create.sql fixture (same rows as test_reference_batteries)
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


def _ibm_series(quote, col="close"):
    return (
        quote.filter(F.col("symbol") == "IBM")
        .orderBy("day")
        .select(F.col(col).alias("val"))
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], float(t[0][0])))
        .toDF("pos long, val double")
    )


def _approx(got, want, rel=1e-5):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=rel, abs=1e-6), (got, want)


# --- sql/operators.sql vs expected/operators.out ---------------------------

def test_operators_arithmetic(quote):
    o, c = F.col("open"), F.col("close")
    _approx(_ibm(quote, E.add(o, c)), [20.7, 40.4, 60.7, 80.7, 100.7])
    _approx(_ibm(quote, E.sub(o, c)), [-0.3, 0, 0.299999, 0.299999, -0.299999])
    _approx(_ibm(quote, E.mul(o, c)), [107.1, 408.04, 921.1, 1628.1, 2535.1])
    _approx(_ibm(quote, E.div(o, c)), [0.971429, 1, 1.00993, 1.00746, 0.994059])
    _approx(_ibm(quote, E.mod(o, c)), [10.2, 0, 0.299999, 0.299999, 50.2])
    # ^ is double pow in the reference (float8 output, 15 digits)
    _approx(
        _ibm(quote, E.pow(o, c)),
        [38931552097.3912, 2.33398999511658e26, 6.6966296391943e44,
         4.16574958399165e64, 7.68312765681365e85],
        rel=1e-12,
    )
    _approx(_ibm(quote, E.neg(o)), [-10.2, -20.2, -30.5, -40.5, -50.2])
    _approx(
        _ibm(quote, E.abs(E.sub(o, c))),
        [0.3, 0, 0.299999, 0.299999, 0.299999],  # @(Open-Close)
    )
    _approx(_ibm(quote, E.maxof(o, c)), [10.5, 20.2, 30.5, 40.5, 50.5])
    _approx(_ibm(quote, E.minof(o, c)), [10.2, 20.2, 30.2, 40.2, 50.2])


def test_operators_comparisons_and_logic(quote):
    o, c = F.col("open"), F.col("close")
    h, lo = F.col("high"), F.col("low")

    def bits(col):
        return [int(v) for v in _ibm(quote, E.as_int8(col))]

    assert bits(E.gt(o, c)) == [0, 0, 1, 1, 0]
    assert bits(E.ge(o, c)) == [0, 1, 1, 1, 0]
    assert bits(E.lt(o, c)) == [1, 0, 0, 0, 1]
    assert bits(E.le(o, c)) == [1, 1, 0, 0, 1]
    assert bits(E.eq(o, c)) == [0, 1, 0, 0, 0]
    assert bits(E.ne(o, c)) == [1, 0, 1, 1, 1]
    # (Open>=Close) & (High<>Low);  (Open>Close) | (High=Low);
    # (Open=Close) # (High=Low);  !(Open=Close)
    assert [
        int(v) for v in _ibm(
            quote, E.bit_and(E.as_int8(E.ge(o, c)), E.as_int8(E.ne(h, lo)))
        )
    ] == [0, 0, 1, 1, 0]
    assert [
        int(v) for v in _ibm(
            quote, E.bit_or(E.as_int8(E.gt(o, c)), E.as_int8(E.eq(h, lo)))
        )
    ] == [0, 1, 1, 1, 0]
    assert [
        int(v) for v in _ibm(
            quote, E.bit_xor(E.as_int8(E.eq(o, c)), E.as_int8(E.eq(h, lo)))
        )
    ] == [0, 0, 0, 0, 0]
    assert bits(E.logical_not(E.eq(o, c))) == [1, 0, 1, 1, 1]
    # Day = date('1-Nov-2013')
    assert bits(E.eq(F.col("day"), F.lit("2013-11-01").cast("date"))) == [1, 0, 0, 0, 0]


def test_operators_bitwise_int(quote):
    v = F.col("volume")
    assert _ibm(quote, E.bit_not(v)) == [-101, -201, -301, -401, -501]
    assert _ibm(quote, E.bit_and(v, F.lit(1))) == [0, 0, 0, 0, 0]
    assert _ibm(quote, E.bit_or(v, F.lit(1))) == [101, 201, 301, 401, 501]
    assert _ibm(quote, E.bit_xor(v, F.lit(-1))) == [-101, -201, -301, -401, -501]


def test_operators_weighted_aggs_and_corr(quote):
    ibm = quote.filter(F.col("symbol") == "IBM")
    row = ibm.agg(
        A.wsum("volume", "close").alias("wsum"),   # Close +* Volume
        A.wavg("volume", "close").alias("wavg"),   # Volume // Close
        A.corr("open", "close").alias("corr"),     # Open ~ Close
    ).first()
    assert row["wsum"] == pytest.approx(55480.0006866455, rel=1e-12)
    # expected/operators.out:44-47 quirk: the reference's cs_wavg
    # multiplies each w·v at the ELEMENT type (float4 here) before the
    # double accumulation — while its cs_wsum (and our wavg) keep the
    # products in double. Verified numerically: float4 products give
    # exactly its 36.9866668294271; double products give ours.
    assert row["wavg"] == pytest.approx(36.98666712443034, rel=1e-12)
    ref_quirk = ibm.agg(
        (F.sum((F.col("volume").cast("float") * F.col("close")).cast("double"))
         / F.sum(F.col("volume").cast("double"))).alias("w")
    ).first()["w"]
    assert ref_quirk == pytest.approx(36.9866668294271, rel=1e-12)
    assert row["corr"] == pytest.approx(0.99982502975582, rel=1e-10)


def test_operators_filter_and_filter_pos(quote):
    # (Open>Close)?Day  and  ?(Open>Close), through the engine's own
    # positional operators (cs_filter / cs_filter_pos)
    ibm = _ibm_series(quote, "close").withColumnRenamed("val", "close_v")
    opens = _ibm_series(quote, "open").withColumnRenamed("val", "open")
    days = [str(d) for d in _ibm(quote, F.col("day"))]
    s = ibm.join(opens, "pos").withColumn(
        "val",
        F.element_at(F.array(*[F.lit(d) for d in days]), F.col("pos").cast("int") + 1),
    )
    kept = positional.filter_(
        s.select("pos", "val", "open", "close_v"),
        F.col("open") > F.col("close_v"),
    )
    assert [r["val"] for r in kept.orderBy("pos").collect()] == [
        "2013-11-04", "2013-11-05",
    ]
    fpos = positional.filter_pos(
        s.select("pos", F.col("close_v").alias("val"), "open"),
        F.col("open") > F.col("val"),
    )
    assert [r["val"] for r in fpos.orderBy("pos").collect()] == [2, 3]


def test_operators_norm(quote):
    s = _ibm_series(quote, "close")
    got = [r["norm"] for r in timeseries.norm(s).orderBy("pos").collect()]
    _approx(
        got,
        [0.140354513651518, 0.270015360270729, 0.403686325653127,
         0.537357291035525, 0.67503837518111],
        rel=1e-12,
    )


def test_operators_series_scalar_and_shifts(spark):
    # cs_parse + const / scalar / text-series
    s = sources.parse(spark, "int4:{1,2,3,4}")
    plus_const = s.withColumn("val", E.add(F.col("val"), F.lit(3.14).cast("float")))
    _approx([r["val"] for r in plus_const.orderBy("pos").collect()],
            [4.14, 5.14, 6.14, 7.14])
    plus_ten = s.withColumn("val", E.add(F.col("val"), F.lit(10)))
    assert [r["val"] for r in plus_ten.orderBy("pos").collect()] == [11, 12, 13, 14]
    other = sources.parse(spark, "int4:{10,20,30,40}")
    joined = s.join(other.withColumnRenamed("val", "o"), "pos")
    assert [
        r["v"] for r in joined.select("pos", E.add(F.col("val"), F.col("o")).alias("v"))
        .orderBy("pos").collect()
    ] == [11, 22, 33, 44]
    # cs_concat('int4:{1,2,3}','int4:{4,5,6}')
    cc = positional.concat(
        sources.parse(spark, "int4:{1,2,3}"), sources.parse(spark, "int4:{4,5,6}")
    )
    assert [r["val"] for r in cc.orderBy("pos").collect()] == [1, 2, 3, 4, 5, 6]
    # shifts: s << 1, s >> 2, s << 10, s >> 10
    five = sources.parse(spark, "int4:{1,2,3,4,5}")
    assert [r["val"] for r in positional.cut_head(five, 1).orderBy("pos").collect()] == [2, 3, 4, 5]
    assert [r["val"] for r in positional.cut_tail(five, 2).orderBy("pos").collect()] == [1, 2, 3]
    assert positional.cut_head(five, 10).count() == 0
    assert positional.cut_tail(five, 10).count() == 0


# --- sql/cumagg.sql vs expected/cumagg.out ---------------------------------

def test_cumagg_battery(quote):
    s = _ibm_series(quote, "close")
    want = {
        "max": ([10.5, 20.2, 30.2, 40.2, 50.5], 1e-5),
        "min": ([10.5, 10.5, 10.5, 10.5, 10.5], 1e-5),
        "sum": ([10.5, 30.7000007629395, 60.9000015258789,
                 101.100002288818, 151.600002288818], 1e-12),
        "avg": ([10.5, 15.3500003814697, 20.3000005086263,
                 25.2750005722046, 30.3200004577637], 1e-12),
        # expected/cumagg.out quirk: the reference's CUMULATIVE var/dev
        # square each x at the ELEMENT type (float4) before the double
        # accumulation, while its GRAND cs_var/cs_dev square in double
        # (grandagg.out's 201.22160451355 is the exact-double value —
        # see test_grandagg_battery). Ours are exact-double everywhere;
        # the reference's own vectors are reproduced below through an
        # explicit float4-square twin.
        "var": ([0.0, 23.522503700256493, 64.68667165120456,
                 122.76688063621532, 200.02159989013686], 1e-12),
        "dev": ([0.0, 4.850000381469727, 8.042802475685841,
                 11.080022592887338, 14.142899274552473], 1e-12),
    }
    for agg, (vals, rel) in want.items():
        out = windows.cum_agg(s, agg)
        got = [r[f"cum_{agg}"] for r in out.orderBy("pos").collect()]
        _approx(got, vals, rel=rel)

    # the reference's element-precision cum_var vector, via f32 squares
    from pyspark.sql import Window

    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    f32sq = (F.col("val").cast("float") * F.col("val").cast("float")).cast("double")
    n = F.count(F.lit(1)).over(w)
    ref_var = (F.sum(f32sq).over(w) / n) - (F.sum("val").over(w) / n) ** 2
    got = [r["rv"] for r in s.withColumn("rv", ref_var).orderBy("pos").collect()]
    _approx(
        got,
        [0, 23.5225078201292, 64.6866720581052, 122.766875371933,
         200.021595678711],
        rel=1e-10,
    )
    got = [r["cum_prd"] for r in windows.cum_prd(s).orderBy("pos").collect()]
    _approx(
        got,
        [10.5, 212.100008010864, 6405.42040374756, 257497.9051176,
         13003644.2084388],
        rel=1e-12,
    )


# --- sql/grandagg.sql vs expected/grandagg.out -----------------------------

def test_grandagg_battery(quote, spark):
    ibm = quote.filter(F.col("symbol") == "IBM")
    row = ibm.agg(
        A.count("day").alias("cnt"),
        A.sum("volume").alias("sum_v"),
        A.avg("volume").alias("avg_v"),
        A.prd(E.sub(F.col("high"), F.col("low"))).alias("prd_hl"),
        A.var("open").alias("var_o"),
        A.dev("close").alias("dev_c"),
        A.approxdc(F.expr("div(volume, 200)")).alias("adc"),
        A.median("close").alias("med"),
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
    ).first()
    assert row["cnt"] == 5 and row["sum_v"] == 1500 and row["avg_v"] == 300
    assert row["prd_hl"] == 0.0  # the 11-02 row has High = Low
    assert row["var_o"] == pytest.approx(201.22160451355, rel=1e-10)
    assert row["dev_c"] == pytest.approx(14.1428992745525, rel=1e-10)
    assert row["adc"] == 3  # div(Volume,200) -> {0,1,1,2,2}
    assert row["med"] == pytest.approx(30.2000007629395, rel=1e-10)
    assert str(row["first_day"]) == "2013-11-01"  # Quote_first
    assert str(row["last_day"]) == "2013-11-06"  # Quote_last

    # per-symbol grand aggs over Quote_get(array['ABB','IBM'], ...)
    sliced = quote.filter(F.col("day").between("2013-11-03", "2013-11-05"))
    mx = {r["symbol"]: r["m"] for r in
          sliced.groupBy("symbol").agg(A.max("close").alias("m")).collect()}
    assert mx["ABB"] == pytest.approx(60.2000007629395, rel=1e-10)
    assert mx["IBM"] == pytest.approx(40.2000007629395, rel=1e-10)
    mn = {r["symbol"]: r["m"] for r in
          quote.groupBy("symbol").agg(A.min("close").alias("m")).collect()}
    assert mn["ABB"] == pytest.approx(60.2000007629395, rel=1e-10)
    assert mn["IBM"] == 10.5
    med = {r["symbol"]: r["m"] for r in
           quote.groupBy("symbol").agg(A.median("close").alias("m")).collect()}
    # even-count median quirk (expected/grandagg.out ABB = 65.3499984741211):
    # the reference averages the two middle elements at the ELEMENT type
    # (float4: f32(60.2f + 70.5f) / 2), ours in double — same class of
    # divergence as the cumagg float4-square note above
    assert med["ABB"] == pytest.approx(65.35000038146973, rel=1e-10)
    import numpy as np

    assert float(
        np.float32(np.float32(60.2) + np.float32(70.5)) / np.float64(2)
    ) == pytest.approx(65.3499984741211, rel=1e-12)
    assert med["IBM"] == pytest.approx(30.2000007629395, rel=1e-10)

    # cs_sum over the concat of all symbols (Quote_concat)
    total = quote.agg(A.sum("close").alias("s")).first()["s"]
    assert total == pytest.approx(282.300003051758, rel=1e-12)

    # literal batteries: cs_sum / cs_all / cs_any on parsed series
    assert sources.parse(spark, "int4:{1,2,3}").agg(A.sum("val")).first()[0] == 6
    assert sources.parse(spark, "int2:{2,3,6}").agg(A.all_("val")).first()[0] == 2
    assert sources.parse(spark, "char:{2,3,6}").agg(A.any_("val")).first()[0] == 7

    # demand-driven compositions (reference evaluates lazily; bounded
    # const reproduces the same finite prefix):
    # cs_sum(cs_limit(cs_filter_pos(cs_const(1,'char')), 0, 3)) = 0+1+2+3
    from imcs_spark.series import const_series

    c = const_series(spark, 1, 8, elem_type="int")
    fpos = positional.filter_pos(c, F.col("val") != 0)
    lim = positional.limit(fpos, 0, 3)
    assert lim.agg(A.sum("val")).first()[0] == 6
    # cs_sum(cs_cum_sum(cs_limit(cs_const(1,'int4'), 0, 3))) = 1+2+3+4
    lim2 = positional.limit(const_series(spark, 1, 8, elem_type="int"), 0, 3)
    assert windows.cum_agg(lim2, "sum").agg(A.sum("cum_sum")).first()[0] == 10


# --- sql/hashagg.sql vs expected/hashagg.out -------------------------------

def test_hashagg_battery(quote, spark):
    ibm = quote.filter(F.col("symbol") == "IBM")
    # Day % 2: the reference's date is an int (days since 2000-01-01)
    par = (F.datediff(F.col("day"), F.lit("2000-01-01").cast("date")) % 2).alias("g")
    d = ibm.select(F.col("close"), par)
    got = {
        r["g"]: (r["mx"], r["mn"], r["sm"], r["av"])
        for r in grouping.hash_agg(
            d,
            {"mx": ("max", "close"), "mn": ("min", "close"),
             "sm": ("sum", "close"), "av": ("avg", "close")},
            ["g"],
        ).collect()
    }
    assert got[0][0] == pytest.approx(50.5, rel=1e-6)
    assert got[1][0] == pytest.approx(40.2, rel=1e-6)
    assert got[0][1] == pytest.approx(20.2, rel=1e-6)
    assert got[1][1] == pytest.approx(10.5, rel=1e-6)
    assert got[0][2] == pytest.approx(100.900001525879, rel=1e-12)
    assert got[1][2] == pytest.approx(50.7000007629395, rel=1e-12)
    assert got[0][3] == pytest.approx(33.6333338419596, rel=1e-12)
    assert got[1][3] == pytest.approx(25.3500003814697, rel=1e-12)

    # compound key (Day%2, Volume%10): both volumes%10 are 0 here, so
    # the two groups match the parity split (expected/hashagg.out:27-33)
    d2 = ibm.select(
        F.col("close"), par, (F.col("volume") % 10).alias("g2")
    )
    got2 = {
        (r["g"], r["g2"]): r["sm"]
        for r in grouping.hash_agg(d2, {"sm": ("sum", "close")}, ["g", "g2"]).collect()
    }
    assert got2[(1, 0)] == pytest.approx(50.7000007629395, rel=1e-12)
    assert got2[(0, 0)] == pytest.approx(100.900001525879, rel=1e-12)

    # cs_hash_count(cs_floor((High-Low)*10)) -> {10.0: 4, 0.0: 1}
    hc = {
        r["k"]: r["n"]
        for r in ibm.select(
            E.floor(E.mul(E.sub(F.col("high"), F.col("low")), F.lit(10))).alias("k")
        ).groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert hc == {10: 4, 0: 1}

    # cs_hash_dup_count(cs_ceil((High-Low)*10), Day%3) -> per-group
    # distinct counts {1:1, 0:1, 2:2}
    par3 = (F.datediff(F.col("day"), F.lit("2000-01-01").cast("date")) % 3).alias("g")
    dd = ibm.select(
        E.ceil(E.mul(E.sub(F.col("high"), F.col("low")), F.lit(10))).alias("v"), par3
    )
    dc = {
        r["g"]: r["dup_count"]
        for r in grouping.hash_dup_count(dd, "v", ["g"], min_occurrences=1).collect()
    }
    assert dc == {0: 1, 1: 1, 2: 2}

    # cs_hash_all / cs_hash_any on literal series (expected:56-68)
    vals = [3, 1, 6, 7, 0, 3, 6, 5, 2, 3, 7]
    keys = [1, 1, 1, 2, 2, 3, 3, 4, 5, 5, 5]
    lit = spark.createDataFrame(list(zip(vals, keys)), "v int, g int")
    alls = {r["g"]: r["a"] for r in lit.groupBy("g").agg(A.all_("v").alias("a")).collect()}
    anys = {r["g"]: r["a"] for r in lit.groupBy("g").agg(A.any_("v").alias("a")).collect()}
    assert alls == {1: 0, 2: 0, 3: 2, 4: 5, 5: 2}
    assert anys == {1: 7, 2: 7, 3: 7, 4: 5, 5: 7}


# --- sql/span.sql vs expected/span.out -------------------------------------

def test_span_battery(quote, spark):
    from imcs_spark.table import Engine

    eng = Engine(spark)
    t = eng.create("quote_span", quote, "day", "symbol")

    def closes(df):
        return [round(float(r["close"]), 4) for r in df.collect()]

    # Quote_get('IBM', from, till): inclusive on both ends
    assert closes(t.get("IBM", "2013-11-02", "2013-11-05").orderBy("day")) == [20.2, 30.2, 40.2]
    assert closes(t.get("IBM", "2013-11-02", None).orderBy("day")) == [20.2, 30.2, 40.2, 50.5]
    assert closes(t.get("IBM", None, "2013-11-05").orderBy("day")) == [10.5, 20.2, 30.2, 40.2]
    assert closes(t.get("IBM").orderBy("day")) == [10.5, 20.2, 30.2, 40.2, 50.5]

    # Quote_span('IBM', from_pos, till_pos): inclusive positions
    assert closes(t.span("IBM", 1, 3).orderBy("day")) == [20.2, 30.2, 40.2]
    assert closes(t.span("IBM", 1).orderBy("day")) == [20.2, 30.2, 40.2, 50.5]
    assert closes(t.span("IBM", 0, 3).orderBy("day")) == [10.5, 20.2, 30.2, 40.2]
    assert closes(t.span("IBM").orderBy("day")) == [10.5, 20.2, 30.2, 40.2, 50.5]

    # multi-symbol forms return each symbol's series (expected/span.out
    # prints ABB then IBM, one series per row)
    multi = t.get(["ABB", "IBM"], "2013-11-02", "2013-11-05")
    per = {
        r["symbol"]: r["cs"]
        for r in multi.groupBy("symbol")
        .agg(F.sort_array(F.collect_list("close")).alias("cs"))
        .collect()
    }
    assert [round(float(x), 4) for x in per["ABB"]] == [60.2]
    assert [round(float(x), 4) for x in per["IBM"]] == [20.2, 30.2, 40.2]
