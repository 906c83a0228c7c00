"""Physical-plan assertions — the scale contract, checkable in CI.

The reference does pushdown/pruning/join-strategy by hand (SURVEY §4);
here Catalyst does it, and these helpers make the *resulting physical
plan* a test surface so a regression (a filter that stops reaching the
parquet scan, a dim join that stops broadcasting, a hot path falling
out of whole-stage codegen into row-at-a-time Python) fails CI instead
of silently costing 100× at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The executed-plan string, as `.explain(mode)` would print it.

    Fast path goes through the JVM explainString helper (no stdout
    round-trip); those are private internals (`_sc._jvm`, `_jdf`) that
    can move across Spark versions, so the public `.explain()` output
    captured from stdout is the fallback — plan-regression tests must
    survive a Spark upgrade rather than all break on an AttributeError.
    """
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *needles: str) -> str:
    """Assert the parquet scan received pushed filters mentioning each
    needle (column name or literal). An empty `PushedFilters: []` on a
    filtered scan means Spark is reading every row-group."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters section in plan:\n{plan}"
    blob = "\n".join(pushed)
    for n in needles:
        assert n in blob, f"filter on {n!r} not pushed to scan; got: {blob}"
    return plan


def assert_broadcast_join(df: DataFrame, count: int = 1) -> str:
    """Assert at least `count` broadcast joins — the small-dim side must
    never shuffle the fact table (SURVEY §7.3 item 7)."""
    plan = physical_plan(df)
    got = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert got >= count, f"expected >= {count} broadcast joins, found {got}:\n{plan}"
    return plan


def assert_no_rowwise_python(df: DataFrame) -> str:
    """Assert no row-at-a-time Python eval in the plan. Arrow-batched
    pandas UDFs (ArrowEvalPython / MapInPandas) are the sanctioned slow
    path; BatchEvalPython (pickled row loops) is never acceptable on a
    hot path."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, f"row-wise Python UDF in plan:\n{plan}"
    return plan


def assert_wholestage_codegen(df: DataFrame) -> str:
    """Assert the plan has at least one whole-stage-codegen span
    (rendered as `[codegen id : N]` in formatted mode).

    Under AQE the codegen annotation only appears once the adaptive
    plan is final, so run the query first (cheap at test SF)."""
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan:
        df.collect()  # finalize THIS DataFrame's adaptive plan in place
        plan = physical_plan(df)
    assert "codegen id" in plan, f"no codegen span:\n{plan}"
    return plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """The ReadSchema column lists from every file scan — for asserting
    column pruning (a 2-column projection must not read 16 columns)."""
    plan = physical_plan(df)
    return [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]
