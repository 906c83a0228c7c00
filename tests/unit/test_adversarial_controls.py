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

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


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
    spark.conf.set("spark.sql.session.timeZone", "Asia/Ho_Chi_Minh")
    try:
        assert _fmt_epoch(spark) == "2020-01-01 07:00"  # the +7h shift
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_hostile_ansi_off_wraps_overflow_silently(spark):
    overflow = F.lit(2147483647).cast("int") + F.lit(1).cast("int")
    with pytest.raises(Exception, match="(?i)overflow"):
        spark.range(1).select(overflow.alias("v")).first()  # ANSI floor: raise
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        got = spark.range(1).select(overflow.alias("v")).first()["v"]
        assert got == -2147483648  # silent two's-complement wrap
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_hostile_case_sensitivity_breaks_resolution(spark):
    q = "SELECT O_ORDERKEY FROM (SELECT 1 AS o_orderkey)"
    assert spark.sql(q).first()["O_ORDERKEY"] == 1  # floor: insensitive
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        with pytest.raises(AnalysisException):
            spark.sql(q).collect()
    finally:
        spark.conf.set("spark.sql.caseSensitive", "false")
