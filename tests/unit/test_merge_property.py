"""Property-based tests: MERGE and SCD2 invariants over arbitrary
key/value batches (SURVEY §5 leg B, hardened).

Each hypothesis example is cheap: the expected result is computed in
plain Python and compared against one Spark job per example, with
max_examples kept small (Spark job latency dominates)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_data_warehouse_spark.operators.merge import merge_upsert

kv_st = st.dictionaries(
    st.integers(min_value=0, max_value=20),  # keys collide on purpose
    st.integers(min_value=-5, max_value=5),
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(kv_st, kv_st)
def test_merge_upsert_matches_dict_semantics(spark, target, source):
    # MERGE == dict.update: survivors kept, matches updated, new inserted
    t = spark.createDataFrame(list(target.items()) or [(None, None)], "pk int, v int").where(
        "pk is not null"
    )
    s = spark.createDataFrame(list(source.items()) or [(None, None)], "pk int, v int").where(
        "pk is not null"
    )
    got = {(r.pk, r.v) for r in merge_upsert(t, s, ["pk"]).collect()}
    expected = dict(target)
    expected.update(source)
    assert got == set(expected.items())


@settings(max_examples=12, deadline=None)
@given(kv_st, st.sets(st.integers(min_value=0, max_value=20), max_size=8))
def test_merge_delete_matches_dict_semantics(spark, target, delete_keys):
    # MERGE DELETE == dict minus keys; idempotent under re-application
    from demo_data_warehouse_spark.operators.merge import merge_delete

    t = spark.createDataFrame(list(target.items()) or [(None, None)], "pk int, v int").where(
        "pk is not null"
    )
    d = spark.createDataFrame([(k,) for k in delete_keys] or [(None,)], "pk int").where(
        "pk is not null"
    )
    once = merge_delete(t, d, ["pk"])
    got = {(r.pk, r.v) for r in once.collect()}
    expected = {(k, v) for k, v in target.items() if k not in delete_keys}
    assert got == expected
    twice = {(r.pk, r.v) for r in merge_delete(once, d, ["pk"]).collect()}
    assert twice == expected


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(st.integers(0, 10), st.integers(0, 100), min_size=1, max_size=6),
    st.dictionaries(st.integers(0, 10), st.integers(101, 200), min_size=1, max_size=6),
)
def test_scd2_delta_invariants(spark, dim_vals, batch_vals):
    """For any current dim snapshot and incoming batch (batch ts strictly
    newer): the delta has exactly one is_current row per touched key,
    closed rows keep the dim's sur_id with valid_to = batch ts, and
    net-new keys appear only as current rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.operators.scd2 import SENTINEL_TS, scd2_delta, surrogate_id

    t_dim = dt.datetime(2024, 1, 1)
    t_new = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [(k, t_dim, v) for k, v in dim_vals.items()], "user_id int, ts timestamp, value int"
    ).select(
        "user_id",
        surrogate_id("user_id", "ts").alias("sur_id"),
        "value",
        "ts",
        F.col("ts").alias("valid_from"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    batch = spark.createDataFrame(
        [(k, t_new, v) for k, v in batch_vals.items()], "user_id int, ts timestamp, value int"
    )
    delta = scd2_delta(dim, batch, key="user_id", ts_col="ts", attr_cols=["value"]).collect()

    current = [r for r in delta if r.is_current]
    closed = [r for r in delta if not r.is_current]
    # exactly one current row per touched key
    touched = set(batch_vals)
    assert sorted(r.user_id for r in current) == sorted(touched)
    # every changed key (already in dim) contributes exactly one closed row
    changed = touched & set(dim_vals)
    assert sorted(r.user_id for r in closed) == sorted(changed)
    dim_rows = {r.user_id: r for r in dim.collect()}
    for r in closed:
        assert r.sur_id == dim_rows[r.user_id].sur_id  # closes in place (J7)
        assert r.valid_to == t_new and r.value == dim_vals[r.user_id]
    for r in current:
        assert r.valid_from == t_new and r.value == batch_vals[r.user_id]


# CDC feed: list of (key, seq, op, value); seqs made unique by enumeration
cdc_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # keys collide on purpose
        st.sampled_from(["U", "I", "D"]),
        st.integers(min_value=-5, max_value=5),
    ),
    max_size=12,
)


def _apply_dict(target: dict, feed_rows):
    """Reference semantics: per key, the highest-seq row acts."""
    out = dict(target)
    last = {}
    for seq, (k, op, v) in enumerate(feed_rows):
        if k not in last or seq > last[k][0]:
            last[k] = (seq, op, v)
    for k, (_seq, op, v) in last.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = v
    return out


def _cdc_dfs(spark, target, feed_rows):
    t = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)], "k int, v int"
    ).where("k is not null")
    f = spark.createDataFrame(
        [(k, seq, op, v) for seq, (k, op, v) in enumerate(feed_rows)]
        or [(None, None, None, None)],
        "k int, seq int, op string, v int",
    ).where("k is not null")
    return t, f


@settings(max_examples=12, deadline=None)
@given(kv_st, cdc_st)
def test_cdc_apply_matches_dict_semantics(spark, target, feed_rows):
    from demo_data_warehouse_spark.operators.merge import apply_changes

    t, f = _cdc_dfs(spark, target, feed_rows)
    got = {r.k: r.v for r in apply_changes(t, f, ["k"], "seq", "op").collect()}
    assert got == _apply_dict(target, feed_rows)


@settings(max_examples=12, deadline=None)
@given(kv_st, cdc_st, st.integers(min_value=0, max_value=12))
def test_cdc_apply_split_batch_convergence(spark, target, feed_rows, split):
    # exactly-once/replay invariant: applying the feed in two seq-ordered
    # batches equals applying it at once
    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.operators.merge import apply_changes

    t, f = _cdc_dfs(spark, target, feed_rows)
    whole = {r.k: r.v for r in apply_changes(t, f, ["k"], "seq", "op").collect()}
    first = apply_changes(t, f.where(F.col("seq") < split), ["k"], "seq", "op")
    both = apply_changes(first, f.where(F.col("seq") >= split), ["k"], "seq", "op")
    assert {r.k: r.v for r in both.collect()} == whole


@settings(max_examples=10, deadline=None)
@given(cdc_st, st.randoms(use_true_random=False))
def test_cdc_versioned_converges_under_any_batching(spark, feed_rows, rng):
    # tombstone-retaining CDC state: ANY partition of the feed into
    # batches, applied in ANY order, reaches the same state — the
    # invariant streaming micro-batching relies on (stream_cdc_apply)
    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.operators.merge import (
        apply_changes_versioned,
        cdc_current,
    )

    rows = [(k, seq, op, v) for seq, (k, op, v) in enumerate(feed_rows)]
    schema = "k int, seq int, op string, v int"
    empty = spark.createDataFrame([], schema)
    whole = apply_changes_versioned(
        empty, spark.createDataFrame(rows, schema) if rows else empty,
        ["k"], "seq", "op",
    )
    want_state = {(r.k, r.seq, r.op, r.v) for r in whole.collect()}
    want_live = {(r.k, r.seq, r.v) for r in cdc_current(whole, "op").collect()}

    shuffled = list(rows)
    rng.shuffle(shuffled)
    n_batches = rng.randint(1, 4)
    state = empty
    for i in range(n_batches):
        batch = shuffled[i::n_batches]
        bdf = spark.createDataFrame(batch, schema) if batch else empty
        state = apply_changes_versioned(state, bdf, ["k"], "seq", "op")
    got_state = {(r.k, r.seq, r.op, r.v) for r in state.collect()}
    assert got_state == want_state
    assert {(r.k, r.seq, r.v) for r in cdc_current(state, "op").collect()} == want_live
