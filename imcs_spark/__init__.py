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
