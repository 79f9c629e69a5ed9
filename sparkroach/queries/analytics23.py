"""Round-4 continuation (wave 13): the SQL DDL/DML front door.

- ``documents_sql_ddl_roundtrip``: the catalog surface a SQL-first
  user drives — ``CREATE TABLE ... USING parquet AS SELECT`` (CTAS
  through the catalog into the warehouse), ``INSERT INTO ... SELECT``
  (the SQL DML append path, InsertIntoHadoopFsRelation), a read-back
  aggregation over the MANAGED table, and ``DROP TABLE`` cleanup.
  The inserted delta is a deterministic derived slice (every 7th doc
  re-keyed into a 'synthetic' source), so the DuckDB oracle mirrors
  the final table as documents ∪ derived-slice arithmetic.  Checksums
  are per-source md5-prefix sums: a row lost in CTAS, doubled by
  INSERT replay, or mangled by the catalog path breaks the hash.
  At 100 TB this is the same writer as df.write (one file per task,
  committed via the output committer); the gate pins the SQL-facing
  contract around it.

Registered gated=False (window full): r5/r6 rotation candidate,
swept by the local oracle gate at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.analytics11 import _th32_sql
from sparkroach.queries.registry import register
from sparkroach.tables import load

DDL_OFFSET = 50_000_000
DDL_MOD = 7


@register(
    "documents_sql_ddl_roundtrip",
    gated=False,
    oracle=f"""
        WITH final_rows AS (
            SELECT doc_id, source, text FROM documents
            UNION ALL
            SELECT doc_id + {DDL_OFFSET}, 'synthetic', text
            FROM documents WHERE doc_id % {DDL_MOD} = 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM({_th32_sql("text")}) AS BIGINT) AS text_hash_sum
        FROM final_rows GROUP BY source ORDER BY source
    """,
    survey_ref="§2C SQL surface — catalog DDL/DML: CREATE TABLE USING "
    "parquet AS SELECT, INSERT INTO ... SELECT, managed-table read-back, "
    "DROP TABLE — the SQL front door around the same parquet writer",
    description=f"CTAS the corpus into a MANAGED warehouse table, INSERT "
    f"INTO a derived slice (every {DDL_MOD}th doc re-keyed +{DDL_OFFSET} "
    "under a 'synthetic' source), aggregate per-source md5-prefix "
    "checksums from the catalog table, DROP it. The oracle mirrors the "
    "final content as documents UNION the derived slice — CTAS losing "
    "rows, INSERT replaying, or catalog-path type drift breaks the hash. "
    "Self-materializing (warehouse table), result checkpointed",
)
def documents_sql_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d.createOrReplaceTempView("ddl_docs_src")
    spark.sql("DROP TABLE IF EXISTS ddl_docs_roundtrip")
    try:
        spark.sql(
            """
            CREATE TABLE ddl_docs_roundtrip USING parquet AS
            SELECT doc_id, source, text FROM ddl_docs_src
            """
        )
        spark.sql(
            f"""
            INSERT INTO ddl_docs_roundtrip
            SELECT doc_id + {DDL_OFFSET}, 'synthetic', text
            FROM ddl_docs_src WHERE doc_id % {DDL_MOD} = 0
            """
        )
        th = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        out = (
            spark.table("ddl_docs_roundtrip")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("doc_id").cast("long").alias("sum_doc_id"),
                F.sum(th).cast("long").alias("text_hash_sum"),
            )
            .orderBy("source")
        )
        return out.localCheckpoint()
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_docs_roundtrip")
