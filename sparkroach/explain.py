"""Print the formatted physical plan of any registered query.

Usage::

    python -m sparkroach.explain q1_pricing_summary [sf_dir]
    python -m sparkroach.explain --all-scan-lines [sf_dir]

The first form prints ``explain("formatted")`` for one query — the
iterate-until-it's-the-plan-you-want loop from SCALE.md.  The second
prints just the parquet-scan lines (PushedFilters / ReadSchema) of every
registered query, the quickest way to eyeball pushdown and pruning
across the whole registry.
"""

from __future__ import annotations

import sys


def _plan(spark, fn, sf_dir: str) -> str:
    df = fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a]
    if not args:
        print(__doc__)
        sys.exit(2)
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from sparkroach.queries import QUERIES
    from sparkroach.session import get_spark

    spark = get_spark("sparkroach-explain", shuffle_partitions=8)
    try:
        if name == "--all-scan-lines":
            for qname, q in sorted(QUERIES.items()):
                try:
                    plan = _plan(spark, q.fn, sf_dir)
                except Exception as e:  # materializing gates etc.
                    print(f"== {qname}: <{type(e).__name__}>")
                    continue
                print(f"== {qname}")
                for line in plan.splitlines():
                    ls = line.strip()
                    if ls.startswith(("PushedFilters", "ReadSchema")):
                        print("   " + ls[:160])
        else:
            if name not in QUERIES:
                print(f"unknown query {name!r}; registry has {len(QUERIES)}")
                sys.exit(2)
            print(_plan(spark, QUERIES[name].fn, sf_dir))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
