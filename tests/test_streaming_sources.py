"""Streaming append + sources/compat layer."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from imcs_spark import sources
from imcs_spark.functions import aggregates as agg
from imcs_spark.streaming import append_stream

from conftest import assert_seq


def test_parse_literal(spark):
    s = sources.parse(spark, "int4:{1,2,3}")
    assert_seq(s, [1, 2, 3])
    d = sources.parse(spark, "float8:{1.5, 2.5}")
    assert_seq(d, [1.5, 2.5])
    with pytest.raises(ValueError):
        sources.parse(spark, "nope")


def test_to_from_array(spark):
    s = sources.parse(spark, "int4:{5,6,7}")
    arr = s.agg(sources.to_array(s).alias("a")).collect()[0]["a"]
    assert arr == [5, 6, 7]
    back = sources.from_array(spark.createDataFrame([([5, 6, 7],)], "a array<int>"), "a")
    assert_seq(back, [5, 6, 7])


def test_call_vectorized(spark):
    s = sources.parse(spark, "float8:{1.0, 4.0, 9.0}")
    out = sources.call(s, lambda x: x**0.5, out_col="r")
    assert [r["r"] for r in out.orderBy("pos").collect()] == [1.0, 2.0, 3.0]


def test_str2code_roundtrip(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",)], "s string")
    coded = sources.str2code(df, "s")
    codes = {r["s"]: r["code"] for r in coded.collect()}
    assert codes["a"] == 0 and codes["b"] == 1
    dictionary = coded.select("s", "code").distinct()
    decoded = sources.code2str(coded.select("code"), dictionary)
    assert sorted(r["s"] for r in decoded.collect()) == ["a", "b", "b"]


def test_approxdc_tolerance(spark, sf_dir):
    """cs_approxdc parity: HLL++ vs exact within ±15% (FIXTURES.md §6)."""
    ev = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = ev.agg(
        agg.approxdc("l_orderkey").alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.15 * row["exact"]


def test_streaming_ordered_append(spark):
    tmp = tempfile.mkdtemp(prefix="imcs_stream_")
    target = os.path.join(tmp, "table")
    chk = os.path.join(tmp, "chk")
    src = os.path.join(tmp, "incoming")
    os.makedirs(src)
    try:
        base = spark.createDataFrame(
            [(1, 100, 1.0), (1, 200, 2.0), (2, 150, 3.0)], "id int, ts long, v double"
        )
        base.write.parquet(target)
        batch = spark.createDataFrame(
            [(1, 300, 4.0), (2, 250, 5.0), (2, 50, 99.0)], "id int, ts long, v double"
        )
        batch.write.parquet(src, mode="overwrite")
        stream = spark.readStream.schema("id int, ts long, v double").parquet(src)
        q = append_stream(
            stream, target, "ts", "id", on_violation="drop", checkpoint=chk
        )
        q.awaitTermination(60)
        final = spark.read.parquet(target)
        rows = {(r["id"], r["ts"]) for r in final.collect()}
        assert (1, 300) in rows and (2, 250) in rows
        assert (2, 50) not in rows  # late row dropped
        assert final.count() == 5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
