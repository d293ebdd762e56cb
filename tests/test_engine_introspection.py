"""Engine.stats() (cs_used_memory / cs_profile parity, reference
imcs.c:5275-5279, 5716-5768) and the money load-boundary conversion
(reference imcs.c:2064-2071: doubles enter as dollars, stored as
cent-scaled int64; here DecimalType(19,2))."""

from decimal import Decimal

from pyspark.sql import functions as F

from imcs_spark.functions import elementwise as E
from imcs_spark.sources import parse
from imcs_spark.table import Engine


def test_engine_stats_reports_cached_memory(spark, sf_dir):
    eng = Engine(spark)
    t = eng.create("events", f"{sf_dir}/events.parquet", "ts", "user_id")
    df = t.df().persist()
    df.count()
    try:
        st = eng.stats()
        assert st["used_memory_bytes"] > 0
        assert any(c["cached_partitions"] > 0 for c in st["cached_rdds"])
        assert st["tables"]["events"]["ts_col"] == "ts"
        assert st["tables"]["events"]["id_col"] == "user_id"
        assert st["tables"]["events"]["columns"] == len(df.columns)
    finally:
        df.unpersist()


def test_money_load_conversion_golden(spark):
    # Golden vectors for the dollars<->cents boundary: the reference
    # multiplies by 100 and rounds-half-away on load (imcs_double2money).
    df = spark.createDataFrame(
        [(1.0,), (0.005,), (12.344,), (12.345,), (-3.125,)], "dollars double"
    )
    out = df.select(
        E.to_money("dollars").alias("m"),
        E.money_to_cents("dollars").alias("cents"),
    ).collect()
    got = [(r["m"], r["cents"]) for r in out]
    assert got == [
        (Decimal("1.00"), 100),
        (Decimal("0.01"), 1),  # HALF_UP at the cent boundary
        (Decimal("12.34"), 1234),
        (Decimal("12.35"), 1235),
        (Decimal("-3.13"), -313),
    ]
    back = df.select(
        E.cents_to_money(E.money_to_cents("dollars")).alias("m2")
    ).collect()
    assert [r["m2"] for r in back] == [
        Decimal("1.00"),
        Decimal("0.01"),
        Decimal("12.34"),
        Decimal("12.35"),
        Decimal("-3.13"),
    ]


def test_money_literal_parse(spark):
    # cs_parse money literals keep group separators and $ (reference
    # transform.sql money battery shapes).
    df = parse(spark, "money:{\"$1,000,000.50\", '2.25', 0.1}")
    vals = [r["val"] for r in df.orderBy("pos").collect()]
    assert vals == [Decimal("1000000.50"), Decimal("2.25"), Decimal("0.10")]


def test_concat_integer_series_ids(spark, sf_dir):
    # Regression: concat's id-order map used a hardcoded string schema,
    # which broke on integer series ids (driver query table_ops).
    from imcs_spark.table import Engine
    from pyspark.sql import functions as F

    eng = Engine(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t = eng.create("ev", ev, "ts", "user_id")
    ids = [r[0] for r in ev.select("user_id").distinct().limit(2).collect()]
    out = t.concat(ids).select("user_id").collect()
    seen = [r[0] for r in out]
    # id-sequence order preserved: all of ids[0]'s rows before ids[1]'s
    assert set(seen) == set(ids)
    first_block = seen[: seen.index(ids[1])] if ids[1] in seen else seen
    assert all(u == ids[0] for u in first_block)


def test_sql_surface_matches_column_factories(spark):
    """register_sql's SQL UDF bodies must stay semantically identical
    to the Column factories (functions/elementwise.py) — compare both
    surfaces over one probe frame, including the 0=Sunday wday shift,
    epoch-week C-truncating division, ln semantics of cs_log, and the
    money round-trip. Also pins that scalar cs_* INLINE (no
    python-udf nodes in the plan)."""
    import pyspark.sql.functions as F

    from imcs_spark.functions import elementwise as E
    from imcs_spark.sqlsurface import register_sql, register_views

    register_sql(spark)
    probe = spark.range(200).select(
        (F.col("id") - 100).cast("double").alias("x"),
        F.timestamp_seconds(F.col("id") * 86400 * 3 + 800_000_000).alias("t"),
        F.format_string("s%d", F.col("id")).alias("s"),
    )
    register_views(spark, probe_sql=probe)
    got = spark.sql("""
        SELECT cs_iif(x > 0.0D, x, cs_neg(x)) AS absx,
               cs_maxof(x, 1.0D) AS mx, cs_minof(x, 1.0D) AS mn,
               cs_log(cs_sqrt(cs_abs(x) + 1.0D)) AS lg,
               cs_wday(t) AS wd, cs_week(t) AS wk, cs_year(t) AS y,
               cs_cat(s, '!') AS cat, cs_ilike(s, 'S1%') AS il,
               cs_money2cents(cs_to_money(x)) AS cents
        FROM probe_sql
    """).orderBy("cat").collect()
    want = probe.select(
        E.iif(F.col("x") > 0, F.col("x"), E.neg("x")).alias("absx"),
        E.maxof("x", F.lit(1.0)).alias("mx"),
        E.minof("x", F.lit(1.0)).alias("mn"),
        E.log(E.sqrt(E.abs("x") + F.lit(1.0))).alias("lg"),
        E.wday("t").alias("wd"), E.week("t").alias("wk"),
        E.year("t").alias("y"),
        E.cat("s", F.lit("!")).alias("cat"),
        E.ilike("s", "S1%").alias("il"),
        E.money_to_cents(E.to_money("x")).alias("cents"),
    ).orderBy("cat").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    plan = spark.sql(
        "SELECT cs_iif(x > 0.0D, cs_sin(x), cs_floor(x)) AS v FROM probe_sql"
    )._jdf.queryExecution().executedPlan().toString()
    assert "python" not in plan.lower(), plan  # inlined, not a PythonUDF

    # UDAF legs: cs_wavg == sum(w*v)/sum(w), cs_prd sign/zero rules
    wavg = spark.sql(
        "SELECT cs_wavg(CAST(id + 1 AS DOUBLE), CAST(id AS DOUBLE)) AS w "
        "FROM range(10)"
    ).first()["w"]
    assert abs(wavg - sum((i + 1) * i for i in range(10)) / sum(i + 1 for i in range(10))) < 1e-12
    prd = spark.sql(
        "SELECT cs_prd(CAST(id - 2 AS DOUBLE)) AS p FROM range(2)"
    ).first()["p"]
    assert prd == 2.0  # (-2) * (-1): even negatives -> positive product
    zero = spark.sql(
        "SELECT cs_prd(CAST(id AS DOUBLE)) AS p FROM range(3)"
    ).first()["p"]
    assert zero == 0.0


def test_profile_counts_operator_invocations(spark):
    """cs_profile(reset): plan-construction bumps per-operator
    counters; output is (command, count) rows + TOTAL, and reset=True
    zeroes them (reference imcs.c:5716-5768)."""
    from imcs_spark import profile as P
    from imcs_spark.operators import positional
    from imcs_spark.series import seq

    eng = Engine(spark)
    P.reset()
    s = seq(spark, [3.0, 1.0, 2.0])
    positional.reverse(s)
    positional.reverse(s)
    positional.head(s, 2)
    rows = dict(eng.profile())
    assert rows["reverse"] == 2
    assert rows["head"] == 1
    assert rows["seq"] >= 1
    assert rows["TOTAL"] == sum(v for k, v in rows.items() if k != "TOTAL")
    # reset drains
    eng.profile(reset=True)
    rows = dict(eng.profile())
    assert rows["TOTAL"] == 0


def test_format_series_round_trips_and_truncates(spark):
    """Text output 'type:{v1,v2,...}' (imcs.c:2654-2952): inverse of
    parse() for every element family; comma-carrying values quoted;
    ,... marker under the string budget."""
    from imcs_spark.sources import format_series

    cases = [
        "int4:{1,2,3}",
        "int8:{-9,0,12345678901}",
        "float8:{1.5,-2.25,0.0}",
        "bool:{t,f,t}",
        "text:{abc,def}",
        'money:{"$1,234.50",$3.99}',
    ]
    for lit in cases:
        s = parse(spark, lit)
        out = format_series(s)
        assert out == lit, (lit, out)
        # round-trip once more through parse
        assert sorted(map(str, parse(spark, out).collect())) == sorted(
            map(str, s.collect())
        )

    # negative money round-trips (format prints '$-1.00'; PG's own
    # '-$1.00' spelling parses identically — sign placement is the one
    # cosmetic divergence from the reference's locale printer)
    s = parse(spark, 'money:{-1.00,"-$1,234.50"}')
    out = format_series(s)
    assert out == 'money:{$-1.00,"$-1,234.50"}'
    assert sorted(map(str, parse(spark, out).collect())) == sorted(
        map(str, s.collect())
    )

    # truncation: budget too small for all elements -> ',...}' tail,
    # and the output still parses as a valid (shorter) literal
    s = parse(spark, "int4:{" + ",".join(str(i) for i in range(100)) + "}")
    out = format_series(s, limit=30)
    assert out.endswith(",...}")
    assert len(out) <= 30 + 5
    head = parse(spark, out.replace(",...", ""))
    vals = [r["val"] for r in head.orderBy("pos").collect()]
    assert vals == list(range(len(vals)))
