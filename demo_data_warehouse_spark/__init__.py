"""demo_data_warehouse_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of NgDucLoc/demo-data-warehouse (an
Airflow + pandas + BigQuery medallion ETL; see SURVEY.md) as idiomatic
Spark DataFrame/SQL, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Layout:
    session.py    SparkSession factory / tuning (UTC, AQE, dyn. partition overwrite)
    catalog.py    testdata table loading helpers
    io.py         partition-replace writer + emulated MERGE upsert sink
    operators/    reusable distributed operators (scd2, merge, dedup, similarity, text)
    functions/    scalar/column helpers (nested-cell parse, ts utils, metrics)
    lark/         reference-parity bronze/silver/gold pipeline semantics
    streaming/    incremental / Structured Streaming surface
    queries/      driver-facing query registry (queries() + oracle_sql())
"""

__version__ = "0.1.0"
