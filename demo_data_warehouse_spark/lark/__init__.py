"""Reference-parity medallion pipeline (bronze → silver → gold) for the
Lark-shaped HR/payment data, re-expressed Spark-first.

Modules:
    schemas.py   bronze column specs + rename maps, silver/gold StructTypes
                 (replaces the reference's runtime BigQuery catalog fetch)
    bronze.py    preprocess_bronze — missing-col fill, millis→ts, null
                 defaults, messy-numeric coercion, project+cast+rename
    silver.py    SCD2 dim builders (employee, vendor) + fact builders
    gold.py      cube_attendance_report derivation (all reference quirks kept)
    source.py    paginated REST source shim + watermark state doc
    pipeline.py  LarkPipeline — the full medallion run over a Warehouse
"""
