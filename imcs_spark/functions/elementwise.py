"""Element-wise scalar algebra: the cs_add/cs_eq/cs_sin/... surface.

Reference: binary op macro family func.c:106-256, unary func.c:258-316,
math funcs imcs.c:5420-5466, date parts imcs.c:5280-5419, LIKE
imcs.c:3298-3374, cast imcs.c:2073-2138.

Everything here is a pure Column expression — JVM-side, whole-stage
codegen, zero Python in the hot path. The functions exist for API
parity with the reference's ~60 scalar operators; idiomatic users can
use pyspark.sql.functions directly.

Semantics quirks preserved from the reference:
- ``log`` is natural log (imcs uses C log()).
- ``wday`` is 0-6 with 0=Sunday (imcs.c:5301-5305, j2day).
- ``week`` is the *epoch week*: Sunday-aligned weeks since the
  PostgreSQL epoch 2000-01-01, computed as trunc((days_since_epoch -
  wday)/7) with C truncating division (imcs.c:5311-5314). NOT ISO week.
- comparisons yield int 0/1 series (reference returns int8), exposed
  here as booleans with an ``as_int8`` helper for exact parity.
- population variance/stddev live in aggregates, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else (F.col(x) if isinstance(x, str) else F.lit(x))


# --- arithmetic (reference func.c:141-256; SQL ops imcs--1.1.sql:564-906) ---
def add(a, b) -> Column:
    return _c(a) + _c(b)


def sub(a, b) -> Column:
    return _c(a) - _c(b)


def mul(a, b) -> Column:
    return _c(a) * _c(b)


def div(a, b) -> Column:
    """cs_div with the reference's C float semantics: x/0 → ±inf,
    0/0 → NaN (expected/math.out's cs_isnan vector). Spark's ANSI mode
    would otherwise raise DIVIDE_BY_ZERO for every zero divisor; the
    CASE-WHEN short-circuits so the ANSI check never fires. (-0.0
    divisors lose their sign — acceptable divergence.)"""
    num, den = _c(a), _c(b)
    inf = F.lit(float("inf"))
    return (
        # NULL in, NULL out — without the explicit guard a NULL divisor
        # falls through `den != 0` (three-valued logic) into the
        # sign-of-numerator branches and returns ±inf/NaN for missing
        # data
        F.when(num.isNull() | den.isNull(), F.lit(None).cast("double"))
        .when(den != 0, num / den)
        .when(num.cast("double") > 0, inf)
        .when(num.cast("double") < 0, -inf)
        .otherwise(F.lit(float("nan")))
    )


def mod(a, b) -> Column:
    """Zero-divisor-safe modulo: the bare % raises REMAINDER_BY_ZERO
    for integral types under Spark 4's default ANSI mode, failing the
    whole job on one zero. try_mod preserves the input type: integral
    x % 0 -> NULL (the C reference would SIGFPE there — undefined
    territory either way, now non-fatal), float % 0 -> IEEE NaN
    exactly like the reference's fmod."""
    return F.try_mod(_c(a), _c(b))


def pow(a, b) -> Column:  # noqa: A001 - mirrors cs_pow
    return F.pow(_c(a), _c(b))


def maxof(a, b) -> Column:
    return F.greatest(_c(a), _c(b))


def minof(a, b) -> Column:
    return F.least(_c(a), _c(b))


def neg(a) -> Column:
    return -_c(a)


def abs(a) -> Column:  # noqa: A001 - mirrors cs_abs
    return F.abs(_c(a))


def isnan(a) -> Column:
    return F.isnan(_c(a))


# --- comparison → 0/1 (reference func.c:141-240) ---
def as_int8(cond: Column) -> Column:
    """Reference comparisons produce int8 0/1 series, not booleans."""
    return cond.cast("tinyint")


def eq(a, b) -> Column:
    return _c(a) == _c(b)


def ne(a, b) -> Column:
    return _c(a) != _c(b)


def gt(a, b) -> Column:
    return _c(a) > _c(b)


def ge(a, b) -> Column:
    return _c(a) >= _c(b)


def lt(a, b) -> Column:
    return _c(a) < _c(b)


def le(a, b) -> Column:
    return _c(a) <= _c(b)


# --- bitwise / logical (func.c:294-317) ---
def bit_and(a, b) -> Column:
    return _c(a).bitwiseAND(_c(b))


def bit_or(a, b) -> Column:
    return _c(a).bitwiseOR(_c(b))


def bit_xor(a, b) -> Column:
    return _c(a).bitwiseXOR(_c(b))


def logical_not(a) -> Column:
    """cs_not: accepts the int8 0/1 series the reference operates on
    (func.c:294-317) as well as booleans — the bare ~ is Spark's
    boolean NOT and refuses integer input at analysis time."""
    return ~(_c(a).cast("boolean"))


def bit_not(a) -> Column:
    """Bitwise complement via the native operator — the -x - 1
    identity overflows on each int type's MIN_VALUE under ANSI mode
    (Long.MIN has no positive negation); ~ has no overflow."""
    return F.bitwise_not(_c(a))


# --- math (imcs.c:5420-5466) ---
def sin(a) -> Column:
    return F.sin(_c(a))


def cos(a) -> Column:
    return F.cos(_c(a))


def tan(a) -> Column:
    return F.tan(_c(a))


def exp(a) -> Column:
    return F.exp(_c(a))


def asin(a) -> Column:
    return F.asin(_c(a))


def acos(a) -> Column:
    return F.acos(_c(a))


def atan(a) -> Column:
    return F.atan(_c(a))


def sqrt(a) -> Column:
    return F.sqrt(_c(a))


def log(a) -> Column:
    """Natural log — imcs cs_log is C log() (ln), unlike PG log10."""
    return F.log(_c(a))


def ceil(a) -> Column:
    return F.ceil(_c(a))


def floor(a) -> Column:
    return F.floor(_c(a))


# --- conditional (cs_iif, imcs.c:3209-3222) ---
def iif(cond, a, b) -> Column:
    return F.when(_c(cond).cast("boolean"), _c(a)).otherwise(_c(b))


# --- strings (cs_cat func.c:366-412; cs_like imcs.c:3298-3374) ---
def cat(a, b) -> Column:
    """Byte-concat used by the reference for compound group keys; in
    Spark we group by multiple columns natively, so this is sugar."""
    return F.concat(_c(a), _c(b))


def add_char(a, ch: str) -> Column:
    """cs_add_char: append one literal character to every element (the
    reference uses it to build delimiter-terminated compound keys)."""
    return F.concat(_c(a), F.lit(ch))


def like(a, pattern: str) -> Column:
    return _c(a).like(pattern)


def ilike(a, pattern: str) -> Column:
    return _c(a).ilike(pattern)


def cast(a, to_type: str) -> Column:
    return _c(a).cast(to_type)


# --- money (reference stores cents in int64; imcs.c:2064-2071) ---
def to_money(a) -> Column:
    """Dollars → cent-scaled DecimalType(19,2), the engine's money
    representation (reference imcs_double2money)."""
    return _c(a).cast("decimal(19,2)")


def money_to_cents(a) -> Column:
    return (_c(a).cast("decimal(19,2)") * 100).cast("long")


def cents_to_money(a) -> Column:
    return (_c(a).cast("decimal(21,0)") / 100).cast("decimal(19,2)")


# --- date parts (imcs.c:5280-5419) ---
def year(a) -> Column:
    return F.year(_c(a))


def month(a) -> Column:
    return F.month(_c(a))


def mday(a) -> Column:
    return F.dayofmonth(_c(a))


def wday(a) -> Column:
    """0=Sunday..6=Saturday (reference j2day, imcs.c:5301-5305).
    Spark dayofweek is 1=Sunday..7, so shift by one."""
    return F.dayofweek(_c(a)) - F.lit(1)


def quarter(a) -> Column:
    return F.quarter(_c(a))


def week(a) -> Column:
    """Epoch-week: Sunday-aligned weeks since 2000-01-01, C-truncated
    division (imcs.c:5311-5314: (date - wday)/7 on PG day numbers).
    Negative for pre-2000 dates, truncated toward zero like C."""
    days = F.datediff(_c(a), F.lit("2000-01-01"))
    shifted = days - wday(a)
    return _trunc_div(shifted, 7)


def _trunc_div(col: Column, d: int) -> Column:
    """C-style truncating integer division (toward zero)."""
    q = F.floor(col / F.lit(d))
    # floor != trunc only for negative non-exact quotients
    return F.when(col < 0, -F.floor(-col / F.lit(d))).otherwise(q).cast("int")


def hour(a) -> Column:
    return F.hour(_c(a))


def minute(a) -> Column:
    return F.minute(_c(a))


def second(a) -> Column:
    return F.second(_c(a))
