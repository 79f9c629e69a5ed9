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
