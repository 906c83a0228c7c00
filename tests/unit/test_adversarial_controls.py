"""Negative controls for the adversarial-session gate (GATE_ADV_*).

The gate's claim is that every query's tune() rescue restores the
verified floor from a session whose semantics-changing confs are all
flipped hostile. That claim is vacuous unless the flipped confs actually
CHANGE results when nothing rescues — so each control here flips one
`session._ADVERSARIAL_CONFS` entry on a bare (wrapper-less) computation
and demands a different outcome than the verified default produces. If
one of these ever stops differing, that conf has lost its teeth and the
adversarial gate's coverage claim must be re-audited.

(Mutation-hardening of the verification stack, VERDICT r9 item 5 —
same positive/negative-control discipline as the TZ digest pin and the
planted-defect sweep controls.)
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.utils import AnalysisException

from demo_data_warehouse_spark.session import _ADVERSARIAL_CONFS, _RUNTIME_CONFS


@contextlib.contextmanager
def _flipped(spark, key):
    """Flip one conf to its _ADVERSARIAL_CONFS value, restoring the
    CAPTURED prior value (not a hardcoded literal) on exit — if
    _RUNTIME_CONFS ever drifts, a literal restore would leave the shared
    session-scoped Spark session in a non-floor state for every later
    test in the run (ADVICE r10). The floor assert makes such drift fail
    loudly here instead of silently re-baselining the control."""
    old = spark.conf.get(key)
    assert old == _RUNTIME_CONFS[key], (
        f"session not at verified floor before flipping {key}: "
        f"found {old!r}, _RUNTIME_CONFS says {_RUNTIME_CONFS[key]!r} — "
        "either a prior test leaked conf state or the floor drifted"
    )
    spark.conf.set(key, _ADVERSARIAL_CONFS[key])
    try:
        yield
    finally:
        spark.conf.set(key, old)

# every hostile conf must have a control below — a conf added to
# _ADVERSARIAL_CONFS without one fails test_every_hostile_conf_has_a_control
CONTROLLED = {
    "spark.sql.session.timeZone": "test_hostile_timezone_changes_formatting",
    "spark.sql.ansi.enabled": "test_hostile_ansi_off_wraps_overflow_silently",
    "spark.sql.caseSensitive": "test_hostile_case_sensitivity_breaks_resolution",
    "spark.sql.timestampType": "test_hostile_ntz_default_changes_cast_type",
    "spark.sql.sources.partitionColumnTypeInference.enabled":
        "test_hostile_inference_off_makes_partition_compare_lexicographic",
    "spark.sql.parquet.inferTimestampNTZ.enabled":
        "test_hostile_ntz_inference_changes_read_type",
}


def test_every_hostile_conf_has_a_control():
    missing = sorted(set(_ADVERSARIAL_CONFS) - set(CONTROLLED))
    assert missing == [], (
        f"adversarial confs without a negative control: {missing} — add one "
        "here or the gate's coverage claim goes stale"
    )


def _fmt_epoch(spark):
    # a FIXED instant (2020-01-01T00:00Z = epoch 1577836800; a MODERN
    # one — Saigon was UTC+8 until 1975, so epoch 0 would read +8h),
    # formatted through the session zone — parsing-and-formatting in
    # the same zone would cancel, an instant cannot
    return spark.range(1).select(
        F.date_format(
            F.timestamp_seconds(F.lit(1577836800)), "yyyy-MM-dd HH:mm"
        ).alias("s")
    ).first()["s"]


def test_hostile_timezone_changes_formatting(spark):
    assert _fmt_epoch(spark) == "2020-01-01 00:00"  # verified floor: UTC
    with _flipped(spark, "spark.sql.session.timeZone"):
        assert _fmt_epoch(spark) == "2020-01-01 07:00"  # the +7h shift


def test_hostile_ansi_off_wraps_overflow_silently(spark):
    overflow = F.lit(2147483647).cast("int") + F.lit(1).cast("int")
    with pytest.raises(Exception, match="(?i)overflow"):
        spark.range(1).select(overflow.alias("v")).first()  # ANSI floor: raise
    with _flipped(spark, "spark.sql.ansi.enabled"):
        got = spark.range(1).select(overflow.alias("v")).first()["v"]
        assert got == -2147483648  # silent two's-complement wrap


def test_hostile_case_sensitivity_breaks_resolution(spark):
    q = "SELECT O_ORDERKEY FROM (SELECT 1 AS o_orderkey)"
    assert spark.sql(q).first()["O_ORDERKEY"] == 1  # floor: insensitive
    with _flipped(spark, "spark.sql.caseSensitive"):
        with pytest.raises(AnalysisException):
            spark.sql(q).collect()


def _cast_type(spark):
    return spark.range(1).select(
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("t")
    ).schema["t"].dataType


def test_hostile_ntz_default_changes_cast_type(spark):
    assert isinstance(_cast_type(spark), TimestampType)  # floor: LTZ
    with _flipped(spark, "spark.sql.timestampType"):
        # the bare cast alias now resolves to NTZ — the type whose
        # wall-clock reinterpretation broke chrono builtins in r02
        assert isinstance(_cast_type(spark), TimestampNTZType)


def test_hostile_inference_off_makes_partition_compare_lexicographic(
    spark, tmp_path
):
    # k=9 vs k=1000 against the boundary '500': numerically only 1000
    # exceeds it; lexicographically only '9' does ('1' < '5' < '9')
    out = str(tmp_path / "pt")
    spark.createDataFrame(
        [(9, "a"), (1000, "b")], "k int, v string"
    ).write.partitionBy("k").parquet(out)
    conf = "spark.sql.sources.partitionColumnTypeInference.enabled"

    def big_k():
        return [
            r["v"]
            for r in spark.read.parquet(out)
            .where(F.col("k") > F.lit("500"))
            .collect()
        ]

    assert big_k() == ["b"]  # floor: k inferred int, literal coerced
    with _flipped(spark, conf):
        # k stays string and the same predicate selects the OTHER row —
        # the silent row-drop class measured and fixed in round 6
        assert big_k() == ["a"]


def test_hostile_ntz_inference_changes_read_type(spark, tmp_path):
    # a parquet whose timestamps carry isAdjustedToUTC=false, written by
    # pyarrow (the current testdata shape): a Spark-written file would
    # embed Spark's own schema metadata in the footer, which overrides
    # the inference conf and would make this control vacuous
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "ntz.parquet")
    pq.write_table(
        pa.table(
            {"ts": pa.array([datetime.datetime(2020, 1, 1)],
                            type=pa.timestamp("us"))}
        ),
        out,
    )
    conf = "spark.sql.parquet.inferTimestampNTZ.enabled"

    def read_type():
        return spark.read.parquet(out).schema["ts"].dataType

    assert isinstance(read_type(), TimestampType)  # floor: read as LTZ
    with _flipped(spark, conf):
        assert isinstance(read_type(), TimestampNTZType)
