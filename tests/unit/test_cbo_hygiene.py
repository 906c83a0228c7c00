"""maintenance_analyze_cbo session hygiene: the query must restore the
CALLER's CBO confs (not hardcode them off) and must not leak cbo_*
tables into the catalog across runs."""

from __future__ import annotations


def test_cbo_confs_restored_and_catalog_clean(spark, sf_dir):
    import __spark_entry__ as m

    run = m.queries()["maintenance_analyze_cbo"]
    # caller has CBO deliberately ON: it must still be ON afterwards
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        assert run(spark, sf_dir).count() == 5
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
    # caller default (off): restored off, and repeated runs leave no
    # cbo_* catalog entries behind
    assert run(spark, sf_dir).count() == 5
    assert spark.conf.get("spark.sql.cbo.enabled") == "false"
    leaked = [t.name for t in spark.catalog.listTables() if t.name.startswith("cbo_")]
    assert leaked == [], leaked
