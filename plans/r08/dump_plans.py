"""Dump explain("formatted") for every gated + bench query to
plans/r08/<name>_<tag>.txt (tag = before/after).

Usage: python plans/r08/dump_plans.py before [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from sparkroach.explain import _plan  # noqa: E402
from sparkroach.queries import QUERIES  # noqa: E402
from sparkroach.session import get_spark  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    spark = get_spark("sparkroach-plandump")
    names = [
        n
        for n, q in sorted(QUERIES.items())
        if (q.gated or q.bench) and (not only or n in only)
    ]
    for n in names:
        path = os.path.join(OUT, f"{n}_{tag}.txt")
        try:
            plan = _plan(spark, QUERIES[n].fn, SF_DIR)
        except Exception as e:
            plan = f"<failed to plan: {type(e).__name__}: {e}>"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
