"""Unit tests for llm_ops15: the mojibake repair decision table and the
script-range regex semantics on literal strings."""

from __future__ import annotations

import sparkroach.queries.llm_ops15 as m
from sparkroach.queries.llm_ops15 import _repair_mojibake


# ---------------------------------------------------------------------------
# mojibake repair decision table
# ---------------------------------------------------------------------------


def test_repair_undoes_one_latin1_misdecode():
    clean = "café №42 — naïve"
    moji = clean.encode("utf-8").decode("latin-1")
    fixed, repaired = _repair_mojibake(moji)
    assert repaired and fixed == clean


def test_pure_ascii_is_never_touched():
    fixed, repaired = _repair_mojibake("plain ascii text")
    assert not repaired and fixed == "plain ascii text"


def test_genuine_latin1_text_is_left_alone():
    # real (single-encoded) accented text: its Latin-1 bytes are NOT
    # valid UTF-8, so the conservative heuristic must not fire
    s = "café"  # é = 0xE9 in latin-1; lone 0xE9 is invalid UTF-8
    fixed, repaired = _repair_mojibake(s)
    assert not repaired and fixed == s


def test_chars_beyond_latin1_are_left_alone():
    s = "данные 数据"  # cannot be a Latin-1 mis-decode at all
    fixed, repaired = _repair_mojibake(s)
    assert not repaired and fixed == s


def test_module_constant_is_the_real_defect():
    assert m._MOJI_MARK == m._CLEAN_MARK.encode("utf-8").decode("latin-1")
    assert _repair_mojibake(m._MOJI_MARK) == (m._CLEAN_MARK, True)


def test_double_mojibake_repairs_one_layer_only():
    clean = "café"
    twice = (
        clean.encode("utf-8")
        .decode("latin-1")
        .encode("utf-8")
        .decode("latin-1")
    )
    fixed, repaired = _repair_mojibake(twice)
    assert repaired
    assert fixed == clean.encode("utf-8").decode("latin-1")  # one layer
    # a second pass finishes the job (the pipeline's iterate-or-flag call)
    assert _repair_mojibake(fixed) == (clean, True)


# ---------------------------------------------------------------------------
# script ranges on literal strings (both engines)
# ---------------------------------------------------------------------------


def test_script_ranges_cross_engine(spark):
    import duckdb

    probe = "latin пример 数据 δ mixed"
    want = {"cyrillic": 6, "cjk": 2, "greek": 1}
    from pyspark.sql import functions as F

    con = duckdb.connect()
    for name, _, _, cls in m._SCRIPTS:
        # F.lit, not a SQL string literal: Spark's SQL parser processes
        # backslashes in literals (DuckDB's does not) — the production
        # code uses F.lit for exactly this reason
        spark_n = (
            spark.range(1)
            .select(F.regexp_count(F.lit(probe), F.lit(cls)).alias("n"))
            .collect()[0]["n"]
        )
        duck_n = con.execute(
            f"SELECT len(regexp_extract_all('{probe}', '{cls}'))"
        ).fetchone()[0]
        assert spark_n == duck_n == want[name], (name, spark_n, duck_n)


def test_markers_match_their_own_ranges_only():
    import re

    for name, _, marker, cls in m._SCRIPTS:
        lo, hi = (int(h, 16) for h in re.findall(r"\\x\{([0-9A-F]{4})\}", cls))
        hits = sum(1 for ch in marker if lo <= ord(ch) <= hi)
        assert hits == len(marker.strip()), (name, marker, hits)
        for other, _, omarker, _ in m._SCRIPTS:
            if other != name:
                foreign = sum(1 for ch in omarker if lo <= ord(ch) <= hi)
                assert foreign == 0, (name, other)
