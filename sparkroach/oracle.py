"""Local mirror of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark DataFrame and the oracle SQL over
the same sf dir, sort columns by name and rows by value, and compare
exactly.  Used by tests/ and by `python -m sparkroach.oracle` for a quick
full sweep while iterating.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from sparkroach.tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def _duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(value):
    """Make a cell comparable across engines."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    import datetime

    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, datetime.date):  # plain date: no sep kwarg
        return value.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).hex()
    if isinstance(value, list):
        return tuple(_normalize(v) for v in value)
    import decimal

    if isinstance(value, decimal.Decimal):
        return float(value)
    return value


def _type_class(type_name: str) -> str:
    """Coarse type equivalence class matching the driver's hash behavior.

    The driver's value-hash treats all ≤64-bit integer widths as
    interchangeable (row_number() int32 vs BIGINT hashes identically) but
    DISTINGUISHES DuckDB HUGEINT (int128 — what a bare SUM(BIGINT)
    returns) from int64, and DECIMAL from DOUBLE.  Round-1 lesson: the
    `token_count_by_source` gate slipped exactly this way — the local
    mirror normalized Decimal→float and int128→int before comparing, so
    it passed locally and hash-failed at the driver.  Types are now
    compared BEFORE values."""
    t = type_name.strip().lower()
    base = t.split("(", 1)[0].strip()
    if base in ("tinyint", "smallint", "int", "integer", "bigint",
                "utinyint", "usmallint", "uinteger", "short", "long"):
        return "int"
    if base in ("hugeint", "uhugeint", "ubigint"):
        return "int128"
    if base in ("float", "double", "real"):
        return "float"
    if base == "decimal":
        return "decimal"
    if base in ("varchar", "string", "text"):
        return "str"
    if base in ("boolean", "bool"):
        return "bool"
    if base in ("timestamp", "timestamp_ntz", "timestamp_ns",
                "timestamp with time zone", "timestamptz", "date"):
        return "time"
    if base in ("blob", "binary", "bytea"):
        return "bytes"
    if base.startswith("array") or t.endswith("[]") or base.startswith("list"):
        return "list"
    return base


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Canonicalize a result frame the way the DRIVER does.

    The driver sorts columns by name, loads the rows into pandas, and
    ``sort_values`` over all columns before hashing.  Round-5 lesson: the
    sim used to sort rows by ``(str(type), str(value))``, which happily
    handles list cells — but pandas ``sort_values`` raises
    ``TypeError: unhashable type: 'list'`` on them, so a query emitting
    an ARRAY column passed the sim and failed the driver
    (``inverted_index_postings``, CORRECTNESS_r05).  The sort now goes
    through pandas on the RAW cells so the sim crashes exactly where the
    driver crashes; value normalization (NaN, Decimal, datetime, bytes)
    happens only after sorting, for the equality check.
    """
    import pandas as pd

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    pdf = pd.DataFrame(
        [[r[i] for i in order] for r in rows],
        columns=[cols[i] for i in order],
        dtype=object,
    )
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    return [
        tuple(_normalize(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def compare(
    name: str,
    df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
) -> CompareResult:
    con = con or _duck_connection(sf_dir)
    spark_rows = df.collect()
    spark_cols = df.columns
    rel = con.sql(oracle_sql)
    oracle_cols = list(rel.columns)
    oracle_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    oracle_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        return CompareResult(
            name,
            False,
            len(spark_rows),
            len(oracle_rows),
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    spark_types = dict(df.dtypes)
    type_diffs = [
        (c, spark_types[c], oracle_types[c])
        for c in spark_cols
        if _type_class(spark_types[c]) != _type_class(oracle_types[c])
    ]
    if type_diffs:
        return CompareResult(
            name,
            False,
            len(spark_rows),
            len(oracle_rows),
            "type mismatch (would hash-diverge at the driver): "
            + ", ".join(f"{c}: spark={s} oracle={o}" for c, s, o in type_diffs),
        )
    if len(spark_rows) != len(oracle_rows):
        return CompareResult(
            name,
            False,
            len(spark_rows),
            len(oracle_rows),
            f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}",
        )
    s = _canon([tuple(r) for r in spark_rows], spark_cols)
    o = _canon(oracle_rows, oracle_cols)
    if s != o:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b
        )
        return CompareResult(
            name,
            False,
            len(spark_rows),
            len(oracle_rows),
            f"value mismatch at sorted row {diff[0]}: spark={diff[1]} oracle={diff[2]}",
        )
    return CompareResult(name, True, len(spark_rows), len(oracle_rows))


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from sparkroach.queries import QUERIES

    if names:
        unknown = sorted(set(names) - set(QUERIES))
        if unknown:
            # fail loudly: a typo'd name silently "passing" by absence
            # is exactly the wrong failure mode for a verification tool
            raise KeyError(f"not in the registry: {unknown}")

    con = _duck_connection(sf_dir)
    results = []
    for name, q in QUERIES.items():
        if names and name not in names:
            continue
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            n = df.count()
            results.append(CompareResult(name, True, n, -1, "rows-only (no oracle)"))
            continue
        try:
            results.append(compare(name, q.fn(spark, sf_dir), q.oracle, sf_dir, con))
        except Exception as exc:  # keep sweeping; report at the end
            results.append(CompareResult(name, False, -1, -1, f"EXCEPTION: {exc}"))
    return results


if __name__ == "__main__":
    import sys

    from sparkroach.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("sparkroach-oracle")
    bad = 0
    for r in run_all(spark, sf_dir, names):
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {r.name:32s} rows={r.spark_rows} {r.detail}")
        bad += 0 if r.ok else 1
    print(f"{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)
