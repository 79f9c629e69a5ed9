"""sparkroach — PySpark-native analytics engine with the query and
data-processing capabilities of algorand/conduit-cockroachdb.

Layout:
  sparkroach.session     — tuned SparkSession builder (local test / cluster)
  sparkroach.tables      — testdata table loaders with explicit schemas
  sparkroach.queries     — the graded query registry (Spark fn + DuckDB oracle)
  sparkroach.chain       — the blockchain-indexer engine itself:
                           schemas, canonical encoding, block→table transforms,
                           MERGE state store, streaming ingest, query surface
  sparkroach.functions   — reusable column-level ops (text, hashing, vectors)
"""

__version__ = "0.1.0"
