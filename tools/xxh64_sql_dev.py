"""Dev harness: generate the DuckDB-SQL XXH64 kernel and validate it
bit-for-bit against a pure-Python XXH64 model (itself validated against
Spark's xxhash64 — seed 42 over UTF-8 bytes, standard XXH64).

The generator itself is copied into imcs_spark/queries.py once green;
this file stays as the reproducible validation harness.
"""

M = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def _u(v: int) -> str:
    return f"{v}::UHUGEINT"


def _mulmod(a: str, b: str) -> str:
    return f"((({a}) * ({b})) % {_u(M)})"


def _addmod(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {_u(M)})"


def _rotl(x: str, r: int) -> str:
    # exact: low 64-r bits shift up (mod 2^64 drops overflow), high r
    # bits land in the low positions; the two parts occupy disjoint
    # bits so + equals |
    return f"({_mulmod(x, _u(1 << r))} + ({x}) // {_u(1 << (64 - r))})"


def _le8(pos_expr: str) -> str:
    """Little-endian u64 from 8 bytes of hex starting at 1-based hex
    position `pos_expr` (an integer SQL expression)."""
    parts = " || ".join(
        f"substr(hxp, ({pos_expr}) + {2 * k}, 2)" for k in range(7, -1, -1)
    )
    return f"('0x' || {parts})::UBIGINT::UHUGEINT"


def _le4(pos_expr: str) -> str:
    parts = " || ".join(
        f"substr(hxp, ({pos_expr}) + {2 * k}, 2)" for k in range(3, -1, -1)
    )
    return f"('0x' || {parts})::UBIGINT::UHUGEINT"


def _byte(pos_expr: str) -> str:
    return f"('0x' || substr(hxp, {pos_expr}, 2))::UBIGINT::UHUGEINT"


def _round(acc: str, lane: str) -> str:
    tmp = _addmod(acc, _mulmod(lane, _u(P2)))
    return _mulmod(_rotl(tmp, 31), _u(P1))


def _merge(acc: str, a: str) -> str:
    return _addmod(_mulmod(f"xor({acc}, {_round(_u(0), a)})", _u(P1)), _u(P4))


def _tail8(acc: str, lane: str) -> str:
    return _addmod(
        _mulmod(_rotl(f"xor({acc}, {_round(_u(0), lane)})", 27), _u(P1)), _u(P4)
    )


def _tail4(acc: str, lane: str) -> str:
    return _addmod(
        _mulmod(_rotl(f"xor({acc}, {_mulmod(lane, _u(P1))})", 23), _u(P2)), _u(P3)
    )


def _tailb(acc: str, byte: str) -> str:
    return _mulmod(_rotl(f"xor({acc}, {_mulmod(byte, _u(P5))})", 11), _u(P1))


def xxh64_ctes(src: str) -> str:
    """CTE chain mapping `src` (a CTE/relation with one VARCHAR column
    `s`, distinct) to `xxh(s, h UHUGEINT, h_hi BIGINT, h_lo BIGINT)`
    where h == XXH64(utf8(s), seed=42) — bit-identical to Spark's
    xxhash64. Requires the enclosing query to be WITH RECURSIVE.

    Shape: hex-encode the UTF-8 bytes once (padded so every fixed-width
    lane read stays in range; guards select which lanes are USED);
    recursive CTE folds the 32-byte stripes (depth = max stripes over
    the input set — 0 for strings under 32 bytes); layered CTEs unroll
    the bounded tail (≤3 u64 lanes, ≤1 u32, ≤3 bytes) and the final
    avalanche, each step referencing the previous accumulator as a
    column so expression size stays linear."""
    a1_0, a2_0, a3_0, a4_0 = (
        (SEED + P1 + P2) % M, (SEED + P2) % M, SEED, (SEED - P1) % M,
    )
    stripe_lane = lambda m: _le8(f"64*i + {16 * m + 1}")  # noqa: E731
    return f"""
xh0 AS (
  SELECT s, hex(encode(s)) || repeat('0', 64) AS hxp,
         octet_length(encode(s)) AS n
  FROM {src}
),
xacc AS (
  SELECT s, hxp, n, n // 32 AS ns, 0 AS i,
         {_u(a1_0)} AS a1, {_u(a2_0)} AS a2,
         {_u(a3_0)} AS a3, {_u(a4_0)} AS a4
  FROM xh0
  UNION ALL
  SELECT s, hxp, n, ns, i + 1,
         {_round('a1', stripe_lane(0))},
         {_round('a2', stripe_lane(1))},
         {_round('a3', stripe_lane(2))},
         {_round('a4', stripe_lane(3))}
  FROM xacc WHERE i < ns
),
xm0 AS (
  SELECT s, hxp, n, a1, a2, a3, a4,
         CASE WHEN n >= 32 THEN
           ((({_rotl('a1', 1)}) + ({_rotl('a2', 7)}) + ({_rotl('a3', 12)})
             + ({_rotl('a4', 18)})) % {_u(M)})
         ELSE {_u((SEED + P5) % M)} END AS acc
  FROM xacc WHERE i = ns
),
xm1 AS (SELECT s, hxp, n, a2, a3, a4,
        CASE WHEN n >= 32 THEN {_merge('acc', 'a1')} ELSE acc END AS acc FROM xm0),
xm2 AS (SELECT s, hxp, n, a3, a4,
        CASE WHEN n >= 32 THEN {_merge('acc', 'a2')} ELSE acc END AS acc FROM xm1),
xm3 AS (SELECT s, hxp, n, a4,
        CASE WHEN n >= 32 THEN {_merge('acc', 'a3')} ELSE acc END AS acc FROM xm2),
xm4 AS (SELECT s, hxp, n,
        CASE WHEN n >= 32 THEN {_merge('acc', 'a4')} ELSE acc END AS acc FROM xm3),
xt0 AS (
  SELECT s, hxp, n % 32 AS r, 64 * (n // 32) + 1 AS hb,
         {_addmod('acc', 'n::UHUGEINT')} AS acc
  FROM xm4
),
xt1 AS (SELECT s, hxp, r, hb,
        CASE WHEN r >= 8 THEN {_tail8('acc', _le8('hb'))} ELSE acc END AS acc FROM xt0),
xt2 AS (SELECT s, hxp, r, hb,
        CASE WHEN r >= 16 THEN {_tail8('acc', _le8('hb + 16'))} ELSE acc END AS acc FROM xt1),
xt3 AS (SELECT s, hxp, r, hb,
        CASE WHEN r >= 24 THEN {_tail8('acc', _le8('hb + 32'))} ELSE acc END AS acc FROM xt2),
xt4 AS (SELECT s, hxp, r, hb + 16 * (r // 8) + 8 * ((r % 8) // 4) AS pb,
        CASE WHEN r % 8 >= 4 THEN {_tail4('acc', _le4('hb + 16 * (r // 8)'))}
        ELSE acc END AS acc FROM xt3),
xt5 AS (SELECT s, hxp, r, pb,
        CASE WHEN r % 4 >= 1 THEN {_tailb('acc', _byte('pb'))} ELSE acc END AS acc FROM xt4),
xt6 AS (SELECT s, hxp, r, pb,
        CASE WHEN r % 4 >= 2 THEN {_tailb('acc', _byte('pb + 2'))} ELSE acc END AS acc FROM xt5),
xt7 AS (SELECT s,
        CASE WHEN r % 4 >= 3 THEN {_tailb('acc', _byte('pb + 4'))} ELSE acc END AS acc FROM xt6),
xa1 AS (SELECT s, {_mulmod(f"xor(acc, acc // {_u(1 << 33)})", _u(P2))} AS acc FROM xt7),
xa2 AS (SELECT s, {_mulmod(f"xor(acc, acc // {_u(1 << 29)})", _u(P3))} AS acc FROM xa1),
xxh AS (
  SELECT s, xor(acc, acc // {_u(1 << 32)}) AS h,
         (xor(acc, acc // {_u(1 << 32)}) // {_u(1 << 32)})::BIGINT AS h_hi,
         (xor(acc, acc // {_u(1 << 32)}) % {_u(1 << 32)})::BIGINT AS h_lo
  FROM xa2
)"""


def py_xxh64(data: bytes, seed: int = SEED) -> int:
    MM = M - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & MM

    def rnd(acc, lane):
        return (rotl((acc + lane * P2) & MM, 31) * P1) & MM

    def merge(acc, a):
        return ((acc ^ rnd(0, a)) * P1 + P4) & MM

    n = len(data)
    i = 0
    if n >= 32:
        a1, a2, a3, a4 = (seed + P1 + P2) & MM, (seed + P2) & MM, seed, (seed - P1) & MM
        while i + 32 <= n:
            a1 = rnd(a1, int.from_bytes(data[i : i + 8], "little")); i += 8
            a2 = rnd(a2, int.from_bytes(data[i : i + 8], "little")); i += 8
            a3 = rnd(a3, int.from_bytes(data[i : i + 8], "little")); i += 8
            a4 = rnd(a4, int.from_bytes(data[i : i + 8], "little")); i += 8
        acc = (rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)) & MM
        for a in (a1, a2, a3, a4):
            acc = merge(acc, a)
    else:
        acc = (seed + P5) & MM
    acc = (acc + n) & MM
    while i + 8 <= n:
        acc = (rotl(acc ^ rnd(0, int.from_bytes(data[i : i + 8], "little")), 27) * P1 + P4) & MM
        i += 8
    if i + 4 <= n:
        acc = (rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & MM), 23) * P2 + P3) & MM
        i += 4
    while i < n:
        acc = (rotl(acc ^ ((data[i] * P5) & MM), 11) * P1) & MM
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & MM
    acc ^= acc >> 29
    acc = (acc * P3) & MM
    acc ^= acc >> 32
    return acc


if __name__ == "__main__":
    import duckdb

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
            "hello world", "héllo wörld ünïcode", "x" * 31, "y" * 32,
            "z" * 33, "w" * 39, "v" * 40, "u" * 63, "t" * 64, "s" * 65,
            "the quick brown fox jumps over the lazy dog " * 3,
            "A" * 100, "日本語テキスト", "mixed 日本 and ascii padding here",
            "q" * 36, "p" * 44, "o" * 47]
    con = duckdb.connect()
    con.execute("CREATE TABLE src AS SELECT * FROM (VALUES " +
                ", ".join("(?)" for _ in strs) + ") t(s)", strs)
    sql = "WITH RECURSIVE srcd AS (SELECT DISTINCT s FROM src)," + xxh64_ctes("srcd") + \
          " SELECT s, h::VARCHAR AS h FROM xxh"
    rows = {s: int(h) for s, h in con.execute(sql).fetchall()}
    bad = 0
    for s in strs:
        want = py_xxh64(s.encode("utf-8"))
        got = rows[s]
        if want != got:
            bad += 1
            print("MISMATCH", repr(s[:20]), want, got)
    print(f"{len(strs) - bad}/{len(strs)} match")
