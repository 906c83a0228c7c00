"""Data-quality driver queries: column profiling + rule-based
quarantine over the events table (generalizing the reference's silent
publish-time filtering, reference dags/utils/etl.py:100-106)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..operators.quality import check_rules, profile
from . import query

_PROFILE_NUM = ["event_id", "user_id", "value"]
_PROFILE_STR = ["event_type"]


def _profile_arm(col: str, numeric: bool) -> str:
    if numeric:
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        mns, mxs = f"MIN({col})", f"MAX({col})"
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {mns} AS min_str, {mxs} AS max_str
    FROM events"""


@query(
    "dq_profile",
    oracle=" UNION ALL ".join(
        [_profile_arm(c, True) for c in _PROFILE_NUM]
        + [_profile_arm(c, False) for c in _PROFILE_STR]
    ),
)
def dq_profile(spark, sf_dir):
    """Column profile in ONE scan (multi-aggregate pass; the per-column
    UNION in the oracle is the semantic spec, not the plan) —
    operators/quality.py::profile."""
    return profile(table(spark, sf_dir, "events"), _PROFILE_NUM, _PROFILE_STR)


@query(
    "dq_quarantine",
    oracle="""
    WITH tagged AS (
        SELECT event_id, event_type, value,
               concat_ws(',',
                   CASE WHEN NOT coalesce(user_id IS NOT NULL, FALSE)
                        THEN 'has_user' END,
                   CASE WHEN NOT coalesce(
                            event_type IN ('click','view','purchase','signup'),
                            FALSE)
                        THEN 'known_type' END,
                   CASE WHEN NOT coalesce(value BETWEEN 0 AND 100, FALSE)
                        THEN 'value_in_range' END
               ) AS violations
        FROM events
    )
    SELECT event_id, event_type, value, violations
    FROM tagged WHERE violations <> ''
    """,
)
def dq_quarantine(spark, sf_dir):
    """Rows failing named validity rules, tagged with what they
    violated (rule NULL ⇒ violation: a row you can't prove valid is
    not valid). The reference silently drops such rows; quarantining
    keeps them auditable — operators/quality.py::check_rules."""
    ev = table(spark, sf_dir, "events")
    rules = {
        "has_user": F.col("user_id").isNotNull(),
        "known_type": F.col("event_type").isin("click", "view", "purchase", "signup"),
        "value_in_range": F.col("value").between(0, 100),
    }
    tagged = check_rules(ev.select("event_id", "event_type", "value", "user_id"), rules)
    return tagged.where(F.col("violations") != "").select(
        "event_id", "event_type", "value", "violations"
    )
