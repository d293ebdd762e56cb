"""cs_profile analog: per-operator invocation counters.

The reference keeps a global ``imcs_command_profile[]`` array that every
executed command bumps, and ``cs_profile(reset)`` dumps the non-zero
(command, counter) rows plus a TOTAL row (imcs.c:5716-5768, counters
bumped at imcs_do_command dispatch). Spark's analog is plan
CONSTRUCTION: each public operator function builds a DataFrame plan
exactly once per query, so counting calls to those functions yields the
same per-command usage profile — at zero runtime cost (nothing is added
to the executed plan; the counter bumps on the driver at build time).

``instrument_module`` wraps a module's public plan-building functions
in place. Internal composition IS counted (an ``asof_join`` that calls
``with_pos`` bumps both), matching the reference, which counts every
executed sub-command of a composite expression.

Driver-side by design: like the reference's backend-local array, the
counters live in this Python process. Executors never see them.
"""

from __future__ import annotations

import functools
import types
from collections import Counter

_COUNTS: Counter = Counter()


def record(name: str) -> None:
    """Bump one command counter (public, for manually-maintained ops)."""
    _COUNTS[name] += 1


def reset() -> None:
    _COUNTS.clear()


def profile(do_reset: bool = False) -> list[tuple[str, int]]:
    """Non-zero (command, count) rows, name-sorted, plus a final
    ('TOTAL', sum) row — the reference's cs_profile(reset) output shape
    (imcs.c:5758-5763 emits TOTAL after the per-command rows)."""
    rows = sorted(_COUNTS.items())
    rows.append(("TOTAL", sum(_COUNTS.values())))
    if do_reset:
        reset()
    return rows


def _wrap(name: str, fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        _COUNTS[name] += 1
        return fn(*args, **kwargs)

    wrapper._imcs_profiled = True
    return wrapper


def instrument_module(mod: types.ModuleType, prefix: str = "") -> int:
    """Wrap the module's own public functions with call counters.
    Only plain functions DEFINED in the module are wrapped (imported
    names, classes, pandas_udf objects and ``_private`` helpers are
    left alone); re-instrumenting is a no-op. Returns the number of
    functions wrapped.

    Caveat (documented, not hidden): call sites that bound the function
    object BEFORE instrumentation (``from x import f`` at import time)
    bypass the counter; attribute-style calls (``x.f(...)``) — the
    package-wide convention — always hit it."""
    n = 0
    for name in dir(mod):
        if name.startswith("_"):
            continue
        fn = getattr(mod, name)
        if not isinstance(fn, types.FunctionType):
            continue
        if fn.__module__ != mod.__name__ or getattr(fn, "_imcs_profiled", False):
            continue
        setattr(mod, name, _wrap(prefix + name, fn))
        n += 1
    return n


def instrument_default_modules() -> int:
    """Instrument the operator/function surface — the package's
    command set. Idempotent."""
    from . import series, sources
    from .functions import aggregates, elementwise
    from .operators import (
        grouping,
        joins,
        positional,
        sorting,
        timeseries,
        windows,
    )

    n = 0
    for mod in (
        positional,
        grouping,
        windows,
        sorting,
        joins,
        timeseries,
        elementwise,
        aggregates,
        series,
        sources,
    ):
        n += instrument_module(mod)
    return n
