"""Self-test for tools/check_correctness.py's per-leg failure
localization (VERDICT r10 item 7): a seeded one-leg corruption in a
composite query's rows must NAME the divergent leg instead of failing
as one opaque value-hash mismatch. Pure-python — no Spark session."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import compare  # noqa: E402


def _mk_rows(vals_by_op):
    # columns (op, v) — build unsorted to exercise the multiset sort
    return [(op, v) for op, vs in vals_by_op.items() for v in vs]


def test_seeded_one_leg_corruption_names_the_leg():
    good = {"cat_len_sum": [42.0], "prd": [3.5], "money_rt": [1.25]}
    bad = dict(good, prd=[3.6])  # corrupt exactly one leg
    problems = compare(
        _mk_rows(bad), ["op", "v"], _mk_rows(good), ["op", "v"]
    )
    assert problems, "corruption must be detected"
    named = [p for p in problems if p.startswith("divergent leg(s):")]
    assert named and "prd" in named[0], problems
    assert "cat_len_sum" not in named[0] and "money_rt" not in named[0], named


def test_row_count_divergence_names_the_leg():
    good = {"a": [1.0, 2.0], "b": [3.0]}
    bad = {"a": [1.0, 2.0], "b": [3.0, 4.0]}  # b gained a row
    problems = compare(
        _mk_rows(bad), ["op", "v"], _mk_rows(good), ["op", "v"]
    )
    named = [p for p in problems if p.startswith("divergent leg(s):")]
    assert named and "b (rows 2 vs 1)" in named[0], problems


def test_clean_match_reports_nothing():
    good = {"a": [1.0], "b": [2.0]}
    assert compare(_mk_rows(good), ["op", "v"], _mk_rows(good), ["op", "v"]) == []


def test_no_leg_column_stays_silent():
    # queries without an op column keep the old behavior
    problems = compare([(1.0,)], ["v"], [(2.0,)], ["v"])
    assert problems and not any(p.startswith("divergent leg(s)") for p in problems)


def test_cross_engine_casing_keeps_leg_alignment():
    # round-12 ADVICE fix: the two sides may report different identifier
    # casings (DuckDB preserves quoted/derived case differently than
    # Spark), and ASCII uppercase sorts BEFORE lowercase — with spark
    # columns (op, V) a case-sensitive sort orders them (V, op) while
    # the duck side's (op, v) stays (op, v), so the leg index built
    # from the spark casing reads the VALUE column on the duck side.
    # The sort must be casing-independent on both sides.
    good = {"a": [1.0], "b": [2.0]}
    bad = dict(good, b=[9.0])
    problems = compare(
        _mk_rows(bad), ["op", "V"], _mk_rows(good), ["op", "v"]
    )
    named = [p for p in problems if p.startswith("divergent leg(s):")]
    assert named and "b" in named[0] and "a" not in named[0], problems
