"""Model-based property test for io.TransactionLog: arbitrary commit
sequences (full/partial/append over two tables) must match a plain
python-dict model at EVERY historical version — the multi-table
consistency contract under any interleaving."""

from __future__ import annotations

import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from demo_data_warehouse_spark.io import TransactionLog
from demo_data_warehouse_spark.streaming.pipeline import scratch_dir

# one step = (table(s) touched, payload ranges, append?)
_step = st.tuples(
    st.sampled_from(["a", "b", "ab"]),
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=1, max_value=5),
    st.booleans(),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_step, min_size=1, max_size=5))
def test_transaction_log_matches_model(spark, steps):
    root = scratch_dir("txn_prop")
    try:
        txn = TransactionLog(spark, root)
        # model: per version, per table, the multiset of k values
        model_hist: list[dict[str, list[int]]] = []
        state: dict[str, list[int]] = {}
        for tables, lo, width, append in steps:
            payload = list(range(lo, lo + width))
            dfs = {}
            for t in tables:
                dfs[t] = spark.createDataFrame([(k,) for k in payload], "k bigint")
            txn.commit(dfs, append=set(tables) if append else None)
            for t in tables:
                if append and t in state:
                    state[t] = state[t] + payload
                else:
                    state[t] = list(payload)
            model_hist.append({t: list(v) for t, v in state.items()})
        # every historical version must replay the model exactly
        for v, snapshot in enumerate(model_hist):
            for t, expect in snapshot.items():
                got = sorted(r.k for r in txn.read(t, version=v).collect())
                assert got == sorted(expect), (v, t, got, expect)
    finally:
        shutil.rmtree(root, ignore_errors=True)
