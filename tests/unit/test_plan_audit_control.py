"""Planted-defect controls for the plan audit (VERDICT r9 item 5 spirit).

`scripts/plan_audit.py` has printed NO FLAGS since round 7 — these
controls prove each of its three flag classes can still fire. A stub
registry plants one query per hazard (an unkeyed cartesian join between
two above-broadcast-threshold sides, a row-at-a-time pickled Python UDF,
and a full-data global sort with no TakeOrdered guard) plus one clean
query as the positive control; the audit must flag exactly the three
plants and exit 1, and must exit 0 with NO FLAGS when given only the
clean query.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from scripts import plan_audit

# spark.range sides sized past the 10 MB autoBroadcastJoinThreshold the
# session pins (8 B/row × 5M = ~40 MB estimated) so the unkeyed join
# cannot be planned as a broadcast nested loop
_BIG = 5_000_000


def _q_cartesian(spark, sf_dir):
    return spark.range(_BIG).crossJoin(
        spark.range(_BIG).withColumnRenamed("id", "id2")
    )


def _q_pickled_udf(spark, sf_dir):
    inc = F.udf(lambda x: x + 1, "bigint", useArrow=False)
    return spark.range(1000).select(inc("id").alias("v"))


def _q_global_sort(spark, sf_dir):
    # sort on a DERIVED key: range output is already ordered by id, so
    # an orderBy("id") is optimized away and plants nothing
    return spark.range(1000).select((F.col("id") % 7).alias("k")).orderBy("k")


def _q_clean(spark, sf_dir):
    return spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()


_PLANTS = {
    "plant_cartesian": _q_cartesian,
    "plant_pickled_udf": _q_pickled_udf,
    "plant_global_sort": _q_global_sort,
    "plant_clean": _q_clean,
}


@pytest.fixture()
def stub_registry(monkeypatch):
    monkeypatch.setattr(entry_mod, "queries", lambda: dict(_PLANTS))


def _run(monkeypatch, names):
    monkeypatch.setattr(
        sys, "argv", ["plan_audit.py", "/root/testdata/sf0.001", *names]
    )
    return plan_audit.main()


def test_audit_flags_all_three_hazards(monkeypatch, capsys, spark, stub_registry):
    rc = _run(monkeypatch, list(_PLANTS))
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "plant_cartesian: CartesianProduct" in out, out
    assert "plant_pickled_udf: BatchEvalPython" in out, out
    assert "plant_global_sort: unguarded global Sort" in out, out
    # the clean query must NOT be flagged — red comes from the plants only
    assert "plant_clean:" not in out.split("FLAGS:")[-1], out


def test_audit_positive_control_clean_query(monkeypatch, capsys, spark, stub_registry):
    rc = _run(monkeypatch, ["plant_clean"])
    out = capsys.readouterr().out
    assert rc == 0 and "NO FLAGS" in out, out
