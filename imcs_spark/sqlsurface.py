"""SQL-facing query surface: `cs_*` callable from plain ``spark.sql``.

The reference engine's ENTIRE user interface is SQL — imcs--1.1.sql
registers ~150 `cs_*` functions plus operator sugar (`+ * << >> |||
+* //`, imcs--1.1.sql:564-906) over its `timeseries` datatype, and the
test batteries (sql/operators.sql, sql/spec.sql) drive everything
through them. In Spark a series is just a DataFrame column, so the
Spark-first translation is:

- **elementwise** `cs_*` → Catalyst-inlined SQL scalar UDFs
  (``CREATE OR REPLACE TEMPORARY FUNCTION name(args) RETURNS t RETURN
  expr``). The body is substituted into the caller's plan during
  analysis, so whole-stage codegen sees the raw expression — zero
  call overhead, full pushdown/pruning through the function. No
  Python in the loop.
- **aggregates with a Spark SQL builtin** → documented name mapping
  (:data:`AGGREGATE_BUILTINS`); registering a wrapper is impossible
  (SQL scalar UDFs cannot contain aggregates) and pointless — the
  builtin IS the operator.
- **aggregates without a builtin** (`cs_prd` sign-aware product,
  `cs_wsum`/`cs_wavg` weighted forms) → Arrow-batched pandas UDAFs
  registered under their `cs_` names, usable in ``GROUP BY`` SQL.
  These move each group's column batches through Arrow once —
  the slow path, kept ONLY for surface parity; the Column-factory
  equivalents (functions/aggregates.py) stay pure JVM expressions
  and are what `queries()` uses on the hot paths.
- **operator sugar** — Spark SQL already has the arithmetic/bitwise
  operators; positional sugar (`<<`, `>>`, `|||`) is the DataFrame
  API's job (operators/positional.py) and has no SQL-function analog
  by design.
- **tables** → :func:`register_views` publishes an Engine's TsTables
  (and any plain DataFrames) as temp views, completing the "switch
  your SQL client to Spark" story.

Semantics pinned to the Python surface (functions/elementwise.py):
`cs_log` is ln (C log(), not PG log10), `cs_wday` is 0=Sunday
(reference j2day, imcs.c:5301-5305), `cs_week` is the Sunday-aligned
epoch-week since 2000-01-01 with C-truncating division
(imcs.c:5311-5314), money is cent-scaled DECIMAL(19,2)
(imcs.c:2064-2071).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

# name -> (arg signature, return type, body expression). Bodies are
# plain Spark SQL; they must stay semantically identical to the
# Column factories in functions/elementwise.py (tests compare them).
SCALAR_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # conditional / pairwise (imcs.c:3209-3222, func.c elementwise)
    "cs_iif": ("c BOOLEAN, a DOUBLE, b DOUBLE", "DOUBLE",
               "CASE WHEN c THEN a ELSE b END"),
    "cs_maxof": ("a DOUBLE, b DOUBLE", "DOUBLE", "greatest(a, b)"),
    "cs_minof": ("a DOUBLE, b DOUBLE", "DOUBLE", "least(a, b)"),
    "cs_neg": ("a DOUBLE", "DOUBLE", "-a"),
    "cs_abs": ("a DOUBLE", "DOUBLE", "abs(a)"),
    "cs_isnan": ("a DOUBLE", "BOOLEAN", "isnan(a)"),
    # math (imcs.c:5420-5466); cs_log is ln
    "cs_sin": ("a DOUBLE", "DOUBLE", "sin(a)"),
    "cs_cos": ("a DOUBLE", "DOUBLE", "cos(a)"),
    "cs_tan": ("a DOUBLE", "DOUBLE", "tan(a)"),
    "cs_asin": ("a DOUBLE", "DOUBLE", "asin(a)"),
    "cs_acos": ("a DOUBLE", "DOUBLE", "acos(a)"),
    "cs_atan": ("a DOUBLE", "DOUBLE", "atan(a)"),
    "cs_exp": ("a DOUBLE", "DOUBLE", "exp(a)"),
    "cs_log": ("a DOUBLE", "DOUBLE", "ln(a)"),
    "cs_sqrt": ("a DOUBLE", "DOUBLE", "sqrt(a)"),
    "cs_ceil": ("a DOUBLE", "BIGINT", "ceil(a)"),
    "cs_floor": ("a DOUBLE", "BIGINT", "floor(a)"),
    # strings (func.c:366-412; imcs.c:3298-3374)
    "cs_cat": ("a STRING, b STRING", "STRING", "concat(a, b)"),
    "cs_add_char": ("a STRING, ch STRING", "STRING", "concat(a, ch)"),
    "cs_like": ("s STRING, p STRING", "BOOLEAN", "s LIKE p"),
    "cs_ilike": ("s STRING, p STRING", "BOOLEAN", "s ILIKE p"),
    # date parts (imcs.c:5280-5419); cs_wday 0=Sunday, cs_week
    # epoch-week with C-truncating division toward zero
    "cs_year": ("t TIMESTAMP", "INT", "year(t)"),
    "cs_month": ("t TIMESTAMP", "INT", "month(t)"),
    "cs_mday": ("t TIMESTAMP", "INT", "day(t)"),
    "cs_wday": ("t TIMESTAMP", "INT", "dayofweek(t) - 1"),
    "cs_quarter": ("t TIMESTAMP", "INT", "quarter(t)"),
    "cs_hour": ("t TIMESTAMP", "INT", "hour(t)"),
    "cs_minute": ("t TIMESTAMP", "INT", "minute(t)"),
    "cs_second": ("t TIMESTAMP", "INT", "second(t)"),
    "cs_week": (
        "t TIMESTAMP", "INT",
        "CAST(CASE WHEN (datediff(CAST(t AS DATE), DATE '2000-01-01')"
        "               - (dayofweek(t) - 1)) < 0"
        "     THEN -floor(-(datediff(CAST(t AS DATE), DATE '2000-01-01')"
        "                   - (dayofweek(t) - 1)) / 7)"
        "     ELSE floor((datediff(CAST(t AS DATE), DATE '2000-01-01')"
        "                 - (dayofweek(t) - 1)) / 7) END AS INT)",
    ),
    # money: cent-scaled DECIMAL(19,2) (imcs.c:2064-2071)
    "cs_to_money": ("a DOUBLE", "DECIMAL(19,2)", "CAST(a AS DECIMAL(19,2))"),
    "cs_money2cents": ("a DECIMAL(19,2)", "BIGINT",
                       "CAST(a * 100 AS BIGINT)"),
    "cs_cents2money": ("a BIGINT", "DECIMAL(19,2)",
                       "CAST(CAST(a AS DECIMAL(21,0)) / 100 AS DECIMAL(19,2))"),
}

# cs_* aggregates that ARE a Spark SQL builtin — use the right-hand
# name directly in SQL; nothing to register (and SQL scalar UDFs
# cannot wrap aggregates). Population variants per the reference
# (func.c:1475-1501).
AGGREGATE_BUILTINS: dict[str, str] = {
    "cs_count": "count",
    "cs_max": "max",
    "cs_min": "min",
    "cs_sum": "sum",
    "cs_avg": "avg",
    "cs_var": "var_pop",
    "cs_dev": "stddev_pop",
    "cs_median": "median",
    "cs_all": "bit_and",
    "cs_any": "bit_or",
    "cs_approxdc": "approx_count_distinct",
    "cs_corr": "corr",
    "cs_cov": "covar_pop",
}


def register_sql(spark: SparkSession) -> None:
    """Register the whole cs_* SQL surface on this session. Idempotent
    (CREATE OR REPLACE / re-register). Scalar functions inline into
    the caller's plan; the three pandas UDAFs are the only Python in
    the surface."""
    for name, (args, ret, body) in SCALAR_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )

    # --- aggregate UDAFs without builtins -------------------------------
    @pandas_udf("double")
    def _cs_prd(v: pd.Series) -> float:
        # sign-aware log-sum, matching functions/aggregates.py:prd
        # (func.c:1458-1466): 0 if any zero, sign = parity of negatives
        import numpy as np

        x = v.to_numpy(dtype="float64")
        x = x[~pd.isna(v).to_numpy()]
        if x.size == 0:
            return None
        if (x == 0).any():
            return 0.0
        sign = -1.0 if int((x < 0).sum()) % 2 else 1.0
        return float(sign * np.exp(np.log(np.abs(x)).sum()))

    @pandas_udf("double")
    def _cs_wsum(w: pd.Series, v: pd.Series) -> float:
        import numpy as np

        prod = w.to_numpy(dtype="float64") * v.to_numpy(dtype="float64")
        mask = ~(pd.isna(w) | pd.isna(v)).to_numpy()
        if not mask.any():
            return None
        return float(np.sum(prod[mask]))

    @pandas_udf("double")
    def _cs_wavg(w: pd.Series, v: pd.Series) -> float:
        import numpy as np

        wa = w.to_numpy(dtype="float64")
        va = v.to_numpy(dtype="float64")
        mask = ~(pd.isna(w) | pd.isna(v)).to_numpy()
        if not mask.any():
            return None
        return float(np.sum(wa[mask] * va[mask]) / np.sum(wa[mask]))

    spark.udf.register("cs_prd", _cs_prd)
    spark.udf.register("cs_wsum", _cs_wsum)
    spark.udf.register("cs_wavg", _cs_wavg)


def register_views(spark: SparkSession, engine=None, **frames) -> None:
    """Publish an Engine's TsTables (and/or keyword DataFrames) as
    temp views so pure-SQL clients can query them — the Spark analog
    of the reference's `Quote_get()` timeseries accessors being
    reachable from any SQL session."""
    if engine is not None:
        for name, t in engine.tables.items():
            t.df.createOrReplaceTempView(name)
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
