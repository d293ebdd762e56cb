"""imcs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of knizhnik/imcs (in-memory columnar
store), re-expressed Spark-first.

Layers:
- session    — SparkSession defaults (AQE, UTC, Arrow)
- series     — the positional spine (pos column) + literals + run-ids
- table      — Engine/TsTable: the cs_create/TABLE_* surface
- functions  — element-wise scalar algebra + grand aggregates
- operators  — positional transforms, grouping, windows, sorting,
               joins (as-of/stretch), time-series specials
- pipeline   — large-scale training-data ops: dedup, similarity,
               text analysis, multimodal plumbing
- streaming  — Structured Streaming ingest (append-trigger analog)
"""

from .session import get_spark
from .table import Engine, TsTable, OutOfOrderAppendError
from .series import seq, const_series, with_pos, zip_with_global_pos, run_id
from . import functions, operators, pipeline, sources, streaming
from . import profile as profile_mod

# cs_profile analog: count operator invocations from process start,
# like the reference's imcs_command_profile[] (imcs.c:5716-5768).
# Build-time only — wrappers bump a driver-side Counter when a plan
# is CONSTRUCTED; the executed plan is untouched.
profile_mod.instrument_default_modules()

# re-bind the package-level convenience names to the instrumented
# wrappers (the import above bound the pre-instrumentation objects)
from .series import seq, const_series, with_pos, zip_with_global_pos, run_id  # noqa: E402,F811

__all__ = [
    "get_spark",
    "Engine",
    "TsTable",
    "OutOfOrderAppendError",
    "seq",
    "const_series",
    "with_pos",
    "zip_with_global_pos",
    "run_id",
]

__version__ = "0.1.0"
