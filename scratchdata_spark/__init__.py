"""scratchdata_spark — a PySpark-native analytics engine.

A from-scratch re-implementation of the capabilities of
scratchdata/scratchdata (HTTP analytics gateway: JSON ingest →
flatten → schema-inferred micro-batch load → SQL passthrough →
JSON/NDJSON/CSV results), built Spark-first:

* storage is partitioned Parquet managed by a schema registry
  (``catalog.TableCatalog``), so Catalyst gets predicate pushdown,
  column pruning and partition pruning for free;
* queries are ``spark.sql`` — the full Spark SQL surface replaces the
  reference's delegated DuckDB dialect;
* ingest is NDJSON micro-batches with the reference's rotation rules
  (size/rows/age) and its type-precedence schema evolution.

Beyond reference parity, ``operators/`` adds the large-scale
training-data-pipeline operators: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), embedding similarity search, text
analysis, multimodal binary columns, and an AS-OF join.
"""

__version__ = "0.1.0"
