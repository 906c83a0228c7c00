"""Data-quality operators: NULL-as-violation rule semantics and
profile null/distinct accounting."""

from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.quality import check_rules, profile, quarantine


def test_null_predicate_is_a_violation(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, -1.0)], "id bigint, v double")
    tagged = check_rules(df, {"v_pos": F.col("v") > 0})
    got = {r["id"]: r["violations"] for r in tagged.collect()}
    # NULL > 0 evaluates NULL -> treated as failure, not silently valid
    assert got == {1: "", 2: "v_pos", 3: "v_pos"}


def test_violations_sorted_and_joined(spark):
    df = spark.createDataFrame([(1, None, -2.0)], "id bigint, name string, v double")
    tagged = check_rules(
        df, {"v_pos": F.col("v") > 0, "has_name": F.col("name").isNotNull()}
    )
    assert tagged.collect()[0]["violations"] == "has_name,v_pos"


def test_quarantine_partitions_rows(spark):
    df = spark.createDataFrame([(1, 1.0), (2, -1.0)], "id bigint, v double")
    valid, bad = quarantine(df, {"v_pos": F.col("v") > 0})
    assert [r["id"] for r in valid.collect()] == [1]
    assert "violations" not in valid.columns
    assert [(r["id"], r["violations"]) for r in bad.collect()] == [(2, "v_pos")]


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "n bigint, s string"
    )
    out = {r["col_name"]: r for r in profile(df, ["n"], ["s"]).collect()}
    n = out["n"]
    assert (n["n_rows"], n["n_null"], n["n_distinct"]) == (4, 1, 2)
    assert (n["min_num"], n["max_num"], n["min_str"], n["max_str"]) == (1.0, 2.0, None, None)
    s = out["s"]
    assert (s["n_null"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    assert s["min_num"] is None
