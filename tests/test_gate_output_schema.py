"""No oracle-bearing query may emit Array/Map/Struct output columns.

The driver canonicalizes every gated result frame with pandas
``sort_values`` over all columns, which raises ``TypeError: unhashable
type: 'list'`` on list-typed cells — that is exactly how
``inverted_index_postings`` went red in CORRECTNESS_r05 despite
hash-matching DuckDB (VERDICT r5 item 3).  The gate contract therefore
effectively requires scalar output columns.  This test types every
registered oracle through DuckDB (binding only — no execution, no Spark)
and fails on any complex-typed output column, so the failure class is
unrepresentable: a list-column gate is caught at test time, before the
driver ever sees it.

Spark-side schemas are pinned transitively: tests/test_oracle_gate.py's
sweep type-checks every Spark result against its oracle's DuckDB types
(sparkroach.oracle._type_class) — a Spark array column facing a scalar
oracle column fails there.
"""

from __future__ import annotations

import duckdb
import pytest

from sparkroach.oracle import _duck_connection
from sparkroach.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _is_complex(duck_type: str) -> bool:
    t = duck_type.strip().lower()
    return (
        t.endswith("[]")
        or t.startswith(("list", "array", "struct", "map", "union"))
    )


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return _duck_connection(SF_DIR)


def test_no_oracle_emits_complex_columns(con):
    offenders = []
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if _is_complex(str(t))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "queries whose output the driver cannot canonicalize (pandas "
        f"sort_values crashes on complex cells): {offenders} — stringify "
        "the column (array_join / array_to_string) on BOTH sides"
    )


def test_no_oracle_emits_decimal_columns(con):
    """No oracle-bearing query may emit DECIMAL output columns.

    The r8 driver recordings proved the failure class empirically: the
    ONLY two hash failures in CORRECTNESS_r08 (orders_benford_audit,
    search_ndcg_report) were the ONLY two registry queries whose output
    contained a DECIMAL column, with rows+schema matching and every cell
    exactly equal under the local mirror at all three SFs.  The driver's
    pandas canonicalization converts DuckDB DECIMAL results to float64
    while Spark's collect yields decimal.Decimal objects, so a raw
    DECIMAL output column hash-diverges no matter how exact the values
    are.  Registry float discipline: compute in DECIMAL, cast to DOUBLE
    as the very last step on BOTH sides."""
    offenders = []
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).strip().upper().startswith("DECIMAL")
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "queries with DECIMAL output columns (driver pandas "
        f"canonicalization hash-diverges on them): {offenders} — cast "
        "to DOUBLE at the very end on BOTH sides"
    )
