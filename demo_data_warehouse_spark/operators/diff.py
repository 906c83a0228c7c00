"""Snapshot reconciliation — classify rows between two table versions
as inserted / deleted / updated.

The reference has no explicit diff, but its SCD2 build *is* one
(reference dags/utils/etl.py:274-354: left-merge to find net-new, inner
join + value compare to find changed); this operator factors that
classification out as a first-class reconciliation primitive — the
thing a warehouse runs to audit a MERGE sink against upstream, or to
derive a change feed between two published snapshots.

Plan shape: one full-outer shuffle join on the key — both sides
partition by the same key, so at 100 TB this is a single co-partitioned
pass; with both snapshots bucketed on the key (io.py write_bucketed) the
Exchange disappears entirely. Change detection compares a fixed column
list with null-safe equality (NULL == NULL is "unchanged", matching
SQL's IS NOT DISTINCT FROM), never a row hash — hashes would make the
result depend on column order and float formatting.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Rows keyed by `keys` whose presence or `compare_cols` values
    differ between snapshots. Output: keys + change_type
    ('inserted'|'deleted'|'updated') + old_<c>/new_<c> per compared
    column. Unchanged rows are dropped (the output is delta-sized)."""
    keys = list(keys)
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    # presence flags survive the outer join even when all compared
    # columns are NULL on one side
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    j = o.join(n, on=keys, how="full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols],
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("inserted"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(~same, F.lit("updated"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def repair_replica(
    authority: DataFrame,
    replica: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Anti-entropy repair: converge `replica` to `authority` touching
    ONLY divergent keys — the cross-region replica-sync pattern. The
    diff (delta-sized) names the keys; the patch is kept = replica
    ⟕anti divergent-keys, plus authority's rows for those keys (covers
    inserted + updated; deleted drops out naturally). Rows already in
    agreement are carried as-is — at 100 TB a repair wave moves the
    divergence, never the table. Returns (repaired, diff) so callers
    can audit what moved; repair_replica(repair_replica(...)) is a
    fixed point (re-diff is empty — pinned by the driver query)."""
    diff = snapshot_diff(replica, authority, keys=keys, compare_cols=compare_cols)
    divergent = diff.select(*keys)
    kept = replica.join(divergent, on=list(keys), how="left_anti")
    patched = authority.join(divergent, on=list(keys), how="left_semi")
    return kept.unionByName(patched), diff
