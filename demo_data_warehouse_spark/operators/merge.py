"""Emulated MERGE upsert (SURVEY §2.1 S4).

The reference's non-replace publish path loads a temp table and runs a
BigQuery ``MERGE INTO target USING temp ON pk… WHEN MATCHED UPDATE …
WHEN NOT MATCHED INSERT`` (reference dags/utils/common/data_helper.py:76-106).
With no Delta Lake in the environment, the relational equivalent over
plain DataFrames/parquet is:

    merged = target ANTI-JOIN source ON pk  ∪  source

i.e. source rows win on PK collision (UPDATE), non-colliding target
rows survive, new source rows append (INSERT). Idempotent: merging the
same source twice yields the same table (ST3 replay safety).

Scale: the anti-join shuffles both sides on the PK — same cost class
as any MERGE; if the source is a small delta, Spark/AQE broadcasts it
and the target is never shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_schemas(target: DataFrame, source: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema evolution for MERGE: project both sides onto the union of
    their columns, filling each side's missing columns with typed nulls
    (the type comes from the side that has the column — matching Delta
    Lake's mergeSchema contract: columns are only ever ADDED, never
    retyped or dropped). Column order: target's columns, then new
    source columns in source order, so existing readers see a stable
    prefix."""
    tgt_types = dict(target.dtypes)
    src_types = dict(source.dtypes)
    conflicts = {
        c: (tgt_types[c], src_types[c])
        for c in tgt_types
        if c in src_types and tgt_types[c] != src_types[c]
    }
    if conflicts:
        raise ValueError(f"schema evolution cannot retype columns: {conflicts}")
    ordered = target.columns + [c for c in source.columns if c not in tgt_types]
    for c in ordered:
        if c not in tgt_types:
            target = target.withColumn(c, F.lit(None).cast(src_types[c]))
        if c not in src_types:
            source = source.withColumn(c, F.lit(None).cast(tgt_types[c]))
    return target.select(*ordered), source.select(*ordered)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    evolve_schema: bool = False,
) -> DataFrame:
    """Return target MERGE source on keys, source winning on collision.

    evolve_schema=True additionally accepts a source whose columns are a
    superset/subset of the target's: new columns appear (null for
    surviving target rows), columns the source lacks survive (null for
    upserted rows) — see align_schemas. With the default False, the
    source must cover the target's columns exactly (a typo'd delta
    schema should fail loudly, not silently null a column)."""
    keys = list(keys)
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from inputs: {missing}")
    if evolve_schema:
        target, source = align_schemas(target, source)
    survivors = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(source.select(*target.columns))


def merge_delete(
    target: DataFrame, deletes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE … WHEN MATCHED DELETE: drop target rows whose key appears
    in `deletes` (the GDPR/right-to-erasure propagation path — a
    delete-key feed applied to a table). One anti-join on the keys;
    with a small delete set Spark broadcasts it and the target is never
    shuffled. Idempotent: re-applying the same delete feed is a no-op.
    """
    keys = list(keys)
    missing = [k for k in keys if k not in target.columns or k not in deletes.columns]
    if missing:
        raise ValueError(f"delete keys missing from inputs: {missing}")
    return target.join(deletes.select(*keys).distinct(), on=keys, how="left_anti")


def apply_changes(
    target: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """APPLY CHANGES INTO — apply a CDC feed (insert/update/delete rows
    with a per-key ordering column) to a table: for each key only the
    highest-`seq_col` feed row acts; a delete removes the key, anything
    else upserts the row's payload (the Delta Live Tables verb; plain
    MERGE can't express per-key ordering or inline deletes).

    Plan: per-key latest is ONE aggregate — max over a (seq, row)
    struct, so partial aggregation collapses the feed map-side and no
    window sort runs; survivors are a key anti-join. Out-of-order and
    replayed feeds converge to the same table (max is idempotent and
    order-free) — the exactly-once property CDC pipelines need, pinned
    by tests/unit/test_merge_property.py::test_cdc_*.
    """
    keys = list(keys)
    payload = [c for c in feed.columns if c not in (*keys, seq_col, op_col)]
    missing = [k for k in keys if k not in target.columns]
    if missing:
        raise ValueError(f"CDC keys missing from target: {missing}")
    latest = (
        feed.groupBy(*keys)
        .agg(
            F.max(
                F.struct(F.col(seq_col), F.col(op_col), *[F.col(c) for c in payload])
            ).alias("__last")
        )
        .select(
            *keys,
            F.col(f"__last.{op_col}").alias(op_col),
            *[F.col(f"__last.{c}").alias(c) for c in payload],
        )
    )
    survivors = target.join(latest.select(*keys), on=keys, how="left_anti")
    upserts = latest.where(F.col(op_col) != delete_op).select(*target.columns)
    return survivors.unionByName(upserts)


def apply_changes_versioned(
    state: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """CDC apply with TOMBSTONE RETENTION — the state-table form of
    apply_changes that converges under ARBITRARY batching (out-of-order
    deliveries split across micro-batches), where apply_changes needs
    seq-ordered batches.

    `state` and `feed` share one shape: keys + seq + op + payload. The
    new state is simply the per-key max-seq row across state ∪ feed —
    a commutative, associative, idempotent reduction, so ANY partition
    of the feed into batches, in ANY order, reaches the same state.
    Deletes are kept as tombstone rows (op = delete_op): dropping them
    would let a late stale row resurrect a deleted key. Readers see
    `cdc_current(state)`; tombstones older than the feed's max-lateness
    horizon are vacuumable. At 100 TB each micro-batch touches one
    keyed aggregate over state ∪ delta — and with state stored
    partitioned by key range, only partitions holding feed keys need
    rewriting (the same scoping io.py::merge_write applies).
    """
    keys = list(keys)
    payload = [c for c in feed.columns if c not in (*keys, seq_col, op_col)]
    cols = [*keys, seq_col, op_col, *payload]
    both = state.select(*cols).unionByName(feed.select(*cols))
    return (
        both.groupBy(*keys)
        .agg(
            F.max(
                F.struct(F.col(seq_col), F.col(op_col), *[F.col(c) for c in payload])
            ).alias("__last")
        )
        .select(
            *keys,
            F.col(f"__last.{seq_col}").alias(seq_col),
            F.col(f"__last.{op_col}").alias(op_col),
            *[F.col(f"__last.{c}").alias(c) for c in payload],
        )
    )


def cdc_current(state: DataFrame, op_col: str, delete_op: str = "D") -> DataFrame:
    """The reader's view of a versioned CDC state: live rows only."""
    return state.where(F.col(op_col) != delete_op).drop(op_col)
