"""Unit tests for llm_ops16: boundary-safe BPE merge application on
adversarial symbol sequences, and a full-encode check against an
independent reference BPE."""

from __future__ import annotations

import sparkroach.queries.llm_ops16 as m


def _apply_merge_py(s: str, a: str, b: str) -> str:
    """Evaluate the module's SQL rewrite semantics in pure Python:
    delimiter-double, left-to-right non-overlapping replace, collapse."""
    padded = " " + s.replace(" ", "  ") + " "
    merged = padded.replace(f" {a}  {b} ", f" {a}{b} ")
    return merged.replace("  ", " ").strip()


def _spark_apply(spark, s: str, a: str, b: str) -> str:
    from pyspark.sql import functions as F

    a_lit = "'" + a.replace("'", "''") + "'"
    b_lit = "'" + b.replace("'", "''") + "'"
    return (
        spark.createDataFrame([(s,)], "s string")
        .select(F.expr(m._apply_merge_sql("s", a_lit, b_lit)).alias("r"))
        .collect()[0]["r"]
    )


def test_merge_does_not_cross_symbol_boundaries(spark):
    # the naive replace('th e') would corrupt 'th ey' → 'the y';
    # delimiter doubling must leave 'th ey' alone
    assert _spark_apply(spark, "x th ey", "th", "e") == "x th ey"
    assert _spark_apply(spark, "t h e", "t", "h") == "th e"


def test_consecutive_occurrences_all_merge(spark):
    # naive single-space replace misses every second occurrence because
    # adjacent matches share the delimiter
    assert _spark_apply(spark, "t h t h t h", "t", "h") == "th th th"


def test_merge_at_string_edges(spark):
    assert _spark_apply(spark, "t h", "t", "h") == "th"
    assert _spark_apply(spark, "t h x", "t", "h") == "th x"
    assert _spark_apply(spark, "x t h", "t", "h") == "x th"


def test_spark_rewrite_matches_python_reference(spark):
    cases = [
        ("a b a b a b a", "a", "b"),
        ("ab c ab c", "ab", "c"),
        ("q", "a", "b"),
        ("a a a a", "a", "a"),  # self-merge: greedy non-overlapping
    ]
    for s, a, b in cases:
        assert _spark_apply(spark, s, a, b) == _apply_merge_py(s, a, b), (
            s,
            a,
            b,
        )


def _reference_bpe(words: dict[str, int], k: int):
    """Independent greedy BPE: pair stats over current symbols, argmax
    with (count desc, 'a+b' asc) tie-break, boundary-safe apply."""
    seqs = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, sy in seqs.items():
            for i in range(len(sy) - 1):
                counts[(sy[i], sy[i + 1])] = (
                    counts.get((sy[i], sy[i + 1]), 0) + words[w]
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}+{kv[0][1]}"))
        a, b = best[0]
        merges.append((a, b))
        for w, sy in seqs.items():
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_full_encode_matches_reference_bpe(spark, monkeypatch):
    words = {
        "theme": 5,
        "these": 4,
        "throne": 3,
        "other": 6,
        "hathat": 2,
    }
    rows = []
    i = 0
    for w, f in words.items():
        for _ in range(f):
            rows.append((i, w, "en", "s", len(w)))
            i += 1

    def fake_load(s, d, n):
        return spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    monkeypatch.setattr(m, "load", fake_load)
    got = m.bpe_encode_apply(spark, "x").collect()[0]
    merges, seqs = _reference_bpe(words, m._BPE_MERGES)
    assert got["merge_table"] == " ".join(f"{a}+{b}" for a, b in merges)
    want_pieces = sum(len(sy) * f for (w, sy), f in zip(seqs.items(), words.values()))
    assert got["total_pieces"] == want_pieces
    assert got["total_chars"] == sum(len(w) * f for w, f in words.items())
    assert got["n_words"] == sum(words.values())
