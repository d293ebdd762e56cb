"""Sources & compat conversions: literal parsing, array bridges, UDF
call — the periphery of SURVEY §2.1/§2.9.

- parse: cs_parse's `'int4:{1,2,3}'` literal syntax → series frame
  (reference imcs.c:2433-2478, func.c:413-593).
- to_array / from_array: timeseries ↔ array conversion
  (cs_to_array/cs_from_array, imcs.c:5532-5715) — collect_list /
  explode (posexplode keeps the positional spine).
- call: cs_call(input, funcoid) — element-wise application of an
  arbitrary function (imcs.c:5467-5531). The Spark-native equivalent is
  a vectorized pandas_udf; `call` wraps a plain Python scalar fn.
- str2code / code2str: the reference dictionary-encodes unbounded
  varchars (imcs.c:2281-2309). Parquet does this internally; provided
  as explicit helpers for API parity.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..series import POS, VAL, seq

_TYPE_MAP = {
    "char": "tinyint",
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "date": "date",
    "time": "bigint",
    "timestamp": "timestamp",
    "money": "decimal(19,2)",
    "float4": "float",
    "float8": "double",
    "bpchar": "string",
    "varchar": "string",
    "text": "string",
    "bool": "boolean",
}

_LITERAL_RE = re.compile(r"^\s*(\w+)\s*:\s*\{(.*)\}\s*$", re.S)


def parse(spark: SparkSession, literal: str) -> DataFrame:
    """cs_parse: `'int4:{1,2,3}'` → series frame (pos, val)."""
    m = _LITERAL_RE.match(literal)
    if not m:
        raise ValueError(f"bad timeseries literal: {literal!r}")
    type_name, body = m.group(1), m.group(2)
    spark_type = _TYPE_MAP.get(type_name)
    if spark_type is None:
        raise ValueError(f"unknown element type {type_name!r}")
    # split on commas NOT inside quotes (money literals like
    # "$1,000,000" carry group separators — reference transform.sql:26)
    items = [
        s.strip()
        for s in re.findall(r'"[^"]*"|\'[^\']*\'|[^,]+', body)
        if s.strip() != ""
    ]
    if spark_type in ("tinyint", "smallint", "int", "bigint"):
        vals = [int(x) for x in items]
    elif spark_type in ("float", "double"):
        vals = [float(x) for x in items]
    elif spark_type == "boolean":
        vals = [x.lower() in ("t", "true", "1") for x in items]
    elif type_name == "money":
        from decimal import Decimal

        # UNQUOTED amounts with thousands separators would be split
        # apart at their commas — '$1,000.50' becomes ['$1', '000.50'],
        # both of which LOOK like valid items (silently wrong by 999).
        # A comma is ambiguous only when the token BEFORE it has no
        # decimal point yet (a separator never follows cents) AND the
        # token after starts with exactly three digits: refuse that
        # shape and require quoting ('"$1,000.50"'). The old raw-body
        # regex matched ACROSS item boundaries and falsely rejected
        # plain lists like '1.00,100.00'.
        unquoted = re.sub(r'"[^"]*"|\'[^\']*\'', " ", body)
        parts = unquoted.split(",")
        for prev, nxt in zip(parts, parts[1:]):
            p = prev.strip()
            if (
                p
                and p[-1].isdigit()
                and "." not in p
                and re.match(r"\d{3}(?!\d)", nxt.strip())
            ):
                raise ValueError(
                    "ambiguous money literal: quote amounts containing"
                    f" thousands separators ({literal!r})"
                )
        vals = [
            Decimal(x.strip("'\"").replace("$", "").replace(",", "")).quantize(
                Decimal("0.01")
            )
            for x in items
        ]
    else:
        vals = [x.strip("'\"") for x in items]
    return seq(spark, vals, spark_type)


def to_array(df: DataFrame, val_col: str = VAL, pos_col: str = POS) -> Column:
    """cs_to_array: aggregate the series into one array column (ordered
    by pos). Use inside .agg(); collects per group, so size-bounded."""
    missing = [c for c in (val_col, pos_col) if c not in df.columns]
    if missing:
        # the returned Column resolves against whatever frame the .agg
        # runs on, so validate against the frame the caller named — a
        # name mismatch would otherwise surface later as a confusing
        # UNRESOLVED_COLUMN on a different DataFrame
        raise ValueError(f"to_array: column(s) {missing} not in frame")
    return F.array_sort(
        F.collect_list(F.struct(F.col(pos_col), F.col(val_col)))
    ).getField(val_col)


def from_array(
    df: DataFrame, array_col: str, val_col: str = VAL, id_col: str | None = None
) -> DataFrame:
    """cs_from_array: explode an array column into a series frame,
    positions from the array index (posexplode). A multi-row frame
    needs ``id_col`` to discriminate the series — without it every row
    would emit pos 0..len-1 and the result would silently violate the
    dense-per-series pos convention (downstream positional joins then
    cross-product per pos)."""
    if id_col:
        return df.select(
            id_col, F.posexplode(array_col).alias(POS, val_col)
        ).withColumn(POS, F.col(POS).cast("long"))
    if df.limit(2).count() > 1:
        raise ValueError(
            "from_array: multi-row frame without id_col — positions would"
            " collide across rows; pass id_col= to key the series"
        )
    return df.select(
        F.posexplode(array_col).alias(POS, val_col)
    ).withColumn(POS, F.col(POS).cast("long"))


def call(
    df: DataFrame,
    fn: Callable,
    val_col: str = VAL,
    out_col: str = "call",
    return_type: str = "double",
) -> DataFrame:
    """cs_call: element-wise arbitrary function, vectorized via Arrow
    (pandas_udf SCALAR) — batches cross the Python boundary once per
    Arrow batch instead of once per row (the reference pays a PG
    function call per element, imcs.c:5467-5531)."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return df.withColumn(out_col, _udf(F.col(val_col)))


def str2code(df: DataFrame, str_col: str, code_col: str = "code") -> DataFrame:
    """cs_str2code compat: dense integer codes for strings (dictionary
    encoding made explicit). Deterministic: codes assigned by sorted
    NON-NULL string order; NULL strings keep their rows with a NULL
    code (an inner join silently dropped them — and let a NULL consume
    a dictionary slot)."""
    from ..series import zip_with_global_pos

    dictionary = zip_with_global_pos(
        df.select(str_col).filter(F.col(str_col).isNotNull()).distinct(),
        [str_col],
        pos_col=code_col,
    )
    return df.join(dictionary, str_col, "left")


def code2str(coded: DataFrame, dictionary: DataFrame, code_col: str = "code") -> DataFrame:
    """cs_code2str compat: decode via broadcast join on the dictionary.
    LEFT join: str2code deliberately preserves NULL-string rows with a
    NULL code, and an inner decode join would silently drop exactly
    those rows on the way back (their string column stays NULL)."""
    return coded.join(F.broadcast(dictionary), code_col, "left")


# Spark type -> reference mnemonic for text output. _TYPE_MAP is
# many-to-one (int8/time -> bigint; bpchar/varchar/text -> string), so
# the ambiguous Spark types are pinned to the canonical mnemonic.
_MNEM_MAP = {v: k for k, v in _TYPE_MAP.items()}
_MNEM_MAP.update({"bigint": "int8", "string": "text", "decimal(19,2)": "money"})


def format_series(
    df: DataFrame,
    val_col: str = VAL,
    pos_col: str = POS,
    type_name: str | None = None,
    limit: int = 1024,
) -> str:
    """Timeseries text OUTPUT: the series as ``'type:{v1,v2,...}'`` —
    the inverse of :func:`parse` and the reference's cs_output_function
    (imcs.c:2654-2952): values joined by commas inside ``{}``, a value
    whose text contains a comma is double-quoted (imcs.c:2925-2929),
    and when the string budget (``imcs.output_string_limit``, default
    1024; 0 = unlimited) runs out the tail is replaced by ``,...``
    before the closing brace.

    Driver-side by design, exactly like the reference (its output
    function materializes the series into one palloc'd string): only
    ceil(limit/2) elements can ever fit the budget, so the collect is
    bounded by ``limit`` regardless of series length. Numeric text uses
    Python's shortest round-trip repr rather than PostgreSQL's
    locale-aware printers; parse(format_series(s)) round-trips."""
    dtype = dict(df.dtypes)[val_col]
    mnem = type_name or _MNEM_MAP.get(dtype)
    if mnem is None:
        raise ValueError(f"format_series: no mnemonic for Spark type {dtype!r}")
    ordered = df.orderBy(pos_col).select(val_col)
    if limit:
        rows = ordered.limit(limit // 2 + 2).collect()
        count_truncated = len(rows) > limit // 2 + 1
    else:
        rows = ordered.collect()
        count_truncated = False

    def fmt(v) -> str:
        if v is None:
            raise ValueError("format_series: series contains NULL")
        if isinstance(v, bool):
            return "t" if v else "f"
        if mnem == "money":
            s = f"${v:,.2f}"
        else:
            s = str(v)
        if "," in s:
            s = f'"{s}"'
        return s

    head = f"{mnem}:"
    parts: list[str] = []
    used = len(head) + 1  # opening brace
    truncated = count_truncated
    for r in rows:
        s = fmt(r[0])
        # reserve room for ',...' + '}' like the reference's
        # OUTPUT_BUF_RESERVE guard — including the FIRST element: when
        # even it cannot fit, the reference emits 'mnem:{,...}'
        # (imcs.c:2941-2948: sep still '{', truncated set before any
        # element was appended), and so do we
        if limit and used + len(s) + 6 > limit:
            truncated = True
            break
        parts.append(s)
        used += len(s) + 1
    body = ",".join(parts)
    tail = ",...}" if truncated else "}"
    return f"{head}{{{body}{tail}"
