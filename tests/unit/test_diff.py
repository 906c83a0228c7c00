"""snapshot_diff: null-safe change detection and presence
classification."""

from demo_data_warehouse_spark.operators.diff import snapshot_diff


def _d(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v string")


def _got(out):
    return {r["id"]: r["change_type"] for r in out.collect()}


def test_classification(spark):
    old = _d(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _d(spark, [(2, "b"), (3, "C"), (4, "d")])
    out = snapshot_diff(old, new, ["id"], ["v"])
    assert _got(out) == {1: "deleted", 3: "updated", 4: "inserted"}
    row3 = {r["id"]: (r["old_v"], r["new_v"]) for r in out.collect()}[3]
    assert row3 == ("c", "C")


def test_null_equals_null_is_unchanged(spark):
    old = _d(spark, [(1, None), (2, None)])
    new = _d(spark, [(1, None), (2, "x")])
    # NULL -> NULL is NOT a change; NULL -> value is
    assert _got(snapshot_diff(old, new, ["id"], ["v"])) == {2: "updated"}


def test_value_to_null_is_updated(spark):
    old = _d(spark, [(1, "x")])
    new = _d(spark, [(1, None)])
    assert _got(snapshot_diff(old, new, ["id"], ["v"])) == {1: "updated"}


def test_all_null_row_still_classified_by_presence(spark):
    """A row whose every compared column is NULL must still be seen as
    present (the _in_old/_in_new flags, not value nullness, drive
    inserted/deleted)."""
    old = _d(spark, [(1, None)])
    new = _d(spark, [(2, None)])
    assert _got(snapshot_diff(old, new, ["id"], ["v"])) == {1: "deleted", 2: "inserted"}
