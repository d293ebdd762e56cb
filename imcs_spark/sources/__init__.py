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


# --- cs_cut / cs_as / cs_as_array compat shims (imcs.c:4813-5181) -----------
# The reference packs compound group keys by byte-concatenating fixed-
# width little-endian values (`(Day%2)||(Volume%10)` in sql/hashagg.sql)
# and decomposes the packed key after aggregation with cs_cut (format
# string), cs_as (registered composite type) or cs_as_array. Spark
# groups by multiple columns natively — these shims exist so reference
# SQL ports one-to-one. They run as Arrow-batched pandas UDFs over
# aggregation OUTPUTS (group keys — cardinality = number of groups, not
# corpus rows), which is why a Python struct codec is acceptable here
# and nowhere near a corpus scan.

_CUT_TOKEN_RE = re.compile(r"([iIfFcCdDtTmM])(\d+)")

_PG_EPOCH = pd.Timestamp("2000-01-01")


def _cut_fields(fmt: str) -> list[tuple[str, int, str, str]]:
    """Parse a cs_cut format string into (letter, size, struct_code,
    spark_type) — the same letters/sizes imcs.c:4830-4904 accepts."""
    out, pos = [], 0
    for m in _CUT_TOKEN_RE.finditer(fmt):
        if m.start() != pos:
            raise ValueError(f"cut: failed to parse format string {fmt!r}")
        pos = m.end()
        letter, size = m.group(1), int(m.group(2))
        if letter in "iI":
            code, typ = {1: ("b", "tinyint"), 2: ("h", "smallint"),
                         4: ("i", "int"), 8: ("q", "bigint")}.get(size, (None, None))
            if code is None:
                raise ValueError(f"cut: invalid int size {size}")
        elif letter in "fF":
            code, typ = {4: ("f", "float"), 8: ("d", "double")}.get(size, (None, None))
            if code is None:
                raise ValueError(f"cut: invalid float size {size}")
        elif letter in "cC":
            if size <= 0:
                raise ValueError(f"cut: invalid char size {size}")
            code, typ = f"{size}s", "string"
        elif letter in "dD":
            if size != 4:
                raise ValueError(f"cut: invalid date size {size}")
            code, typ = "i", "date"  # int32 days since 2000-01-01 (PG)
        elif letter == "t":
            if size != 8:
                raise ValueError(f"cut: invalid time size {size}")
            code, typ = "q", "bigint"  # micros within day
        elif letter == "T":
            if size != 8:
                raise ValueError(f"cut: invalid timestamp size {size}")
            code, typ = "q", "timestamp"  # micros since 2000-01-01 (PG)
        else:  # m / M
            if size != 8:
                raise ValueError(f"cut: invalid money size {size}")
            code, typ = "q", "decimal(19,2)"  # int64 cents
        out.append((letter, size, code, typ))
    if pos != len(fmt):
        raise ValueError(f"cut: failed to parse format string {fmt!r}")
    if not out:
        raise ValueError("cut: empty format string")
    return out


def _decode_field(raw: pd.Series, letter: str, typ: str):
    if typ == "string":
        return raw.map(lambda b: b.split(b"\x00", 1)[0].decode("utf-8"))
    if typ == "date":
        return (_PG_EPOCH + pd.to_timedelta(raw, unit="D")).dt.date
    if typ == "timestamp":
        return _PG_EPOCH + pd.to_timedelta(raw, unit="us")
    if typ == "decimal(19,2)":
        from decimal import Decimal

        return raw.map(lambda c: Decimal(int(c)).scaleb(-2))
    return raw


def cut(col, fmt: str, names: list[str] | None = None) -> Column:
    """cs_cut(bytes, fmt) (imcs.c:4813-4977): unpack a packed
    little-endian compound key into a typed STRUCT column. Field names
    default to f0..fn-1 (the reference returns an anonymous record);
    pass ``names`` for the cs_as composite-type behavior."""
    fields = _cut_fields(fmt)
    names = names or [f"f{i}" for i in range(len(fields))]
    if len(names) != len(fields):
        raise ValueError(
            f"cut: {len(names)} names for {len(fields)} format fields"
        )
    # struct.Struct is not cloudpickle-able — ship the format STRING and
    # compile inside the UDF
    st_fmt = "<" + "".join(c for _, _, c, _ in fields)
    schema = ", ".join(f"{n} {t}" for n, (_, _, _, t) in zip(names, fields))

    @pandas_udf(schema)
    def _cut(b: pd.Series) -> pd.DataFrame:
        import struct

        st = struct.Struct(st_fmt)

        def unpack(v):
            if v is None:
                return (None,) * len(fields)
            if len(v) != st.size:
                raise ValueError(
                    f"cut: packed key is {len(v)} bytes, format {fmt!r} "
                    f"needs {st.size}"
                )
            return st.unpack(v)

        tuples = b.map(unpack)
        cols = {}
        for i, (n, (letter, _, _, typ)) in enumerate(zip(names, fields)):
            cols[n] = _decode_field(tuples.map(lambda t: t[i]), letter, typ)
        return pd.DataFrame(cols)

    return _cut(F.col(col) if isinstance(col, str) else col)


def as_struct(col, fields: list[tuple[str, str]]) -> Column:
    """cs_as(bytes, 'TypeName') (imcs.c:4965-5028): the composite type
    is supplied as [(field_name, fmt_token)] — e.g. PairOfInt =
    [('first', 'i4'), ('second', 'i4')]."""
    return cut(col, "".join(t for _, t in fields), [n for n, _ in fields])


def as_array(col, fmt_token: str, n: int) -> Column:
    """cs_as_array(bytes, elem_type) (imcs.c:5030-5181): unpack n
    equal-typed packed values into an array column."""
    s = cut(col, fmt_token * n)
    return F.array(*[s.getField(f"f{i}") for i in range(n)])


def pack(*parts: tuple) -> Column:
    """The `||` packing side (cs_cat on fixed-width series,
    func.c:366-412): pack(('i4', colA), ('i4', colB)) → binary column
    of little-endian bytes that cut/as_struct decompose. NULL in any
    part → NULL key (Spark concat semantics), with one carve-out: a
    genuine float NaN is a PAYLOAD, not a missing value — the
    reference concatenation packs the NaN bytes, so pack does too
    (round-12 ADVICE fix); only pandas-missing values (None, NaT, NaN
    in a non-float field) yield a NULL key. Consequence (round-13
    ADVICE note): the Arrow/pandas bridge delivers SQL NULL doubles as
    NaN too, so for ``f4``/``f8`` tokens SQL NULL and NaN are
    INDISTINGUISHABLE here and both pack as NaN bytes — a
    previously-NULL key becomes a real (joinable, groupable) NaN-byte
    key. Callers needing NULL-propagation for float parts must
    pre-filter with ``F.isnull(col)`` (or pack a separate validity
    token). date/time/timestamp objects are encoded to the same
    PG-epoch integers cut() decodes (d4 = days since 2000-01-01, t8 =
    micros within day, T8 = micros since 2000-01-01, m/M8 = cents),
    keeping pack/cut round-trip symmetric for every token."""
    fields = []
    for t, _ in parts:
        fs = _cut_fields(t)
        if len(fs) != 1:
            raise ValueError(
                f"pack: each part takes ONE format token, got {t!r} "
                f"({len(fs)} fields) — pass one (token, col) pair per field"
            )
        fields.append(fs[0])
    st_fmt = "<" + "".join(c for _, _, c, _ in fields)
    cols = [F.col(c) if isinstance(c, str) else c for _, c in parts]

    @pandas_udf("binary")
    def _pack(*series: pd.Series) -> pd.Series:
        import datetime
        import struct
        from decimal import Decimal

        st = struct.Struct(st_fmt)
        epoch_date = datetime.date(2000, 1, 1)
        epoch_ts = datetime.datetime(2000, 1, 1)

        def enc(row):
            vals = []
            for v, (letter, size, code, typ) in zip(row, fields):
                if v is None:
                    return None
                if v != v and letter not in "fF":
                    # NaN/NaT outside a float field = pandas-missing
                    return None
                if typ == "string":
                    b = str(v).encode("utf-8")
                    vals.append(b[:size].ljust(size, b"\x00"))
                elif letter in "fF":
                    vals.append(float(v))  # NaN packs as NaN bytes
                elif letter in "dD":
                    if isinstance(v, pd.Timestamp):
                        v = v.date()
                    if isinstance(v, datetime.datetime):
                        v = v.date()
                    if isinstance(v, datetime.date):
                        v = (v - epoch_date).days
                    vals.append(int(v))
                elif letter == "t":
                    if isinstance(v, datetime.time):
                        v = (
                            (v.hour * 60 + v.minute) * 60 + v.second
                        ) * 1_000_000 + v.microsecond
                    vals.append(int(v))
                elif letter == "T":
                    if isinstance(v, pd.Timestamp):
                        v = v.to_pydatetime()
                    if isinstance(v, datetime.datetime):
                        delta = v - epoch_ts
                        v = (
                            delta.days * 86_400 + delta.seconds
                        ) * 1_000_000 + delta.microseconds
                    vals.append(int(v))
                elif letter in "mM":
                    if isinstance(v, Decimal):
                        # dollars.cc -> cents; round half-even like the
                        # cast, never truncate sub-cent digits
                        v = int(v.scaleb(2).to_integral_value())
                    elif isinstance(v, float):
                        # a float money VALUE is dollars, same as
                        # Decimal — int(12.34) would silently pack 12
                        # cents (a 100x scale error); ints alone are
                        # already-cents (the raw wire format cut emits)
                        v = round(v * 100)
                    vals.append(int(v))
                else:
                    vals.append(int(v))
            return st.pack(*vals)

        return pd.Series(map(enc, zip(*series)), dtype=object)

    return _pack(*cols)
