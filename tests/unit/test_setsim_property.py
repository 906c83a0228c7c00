"""Property-based test: prefix-filtered set-similarity join equals
brute force on arbitrary random corpora (SURVEY §5 leg B).

The prefix-filter theorem claims LOSSLESS pruning; hypothesis searches
for a corpus where a qualifying pair shares no prefix token — the
failure mode a wrong prefix-length formula (off-by-one in the ceil)
would produce. Expected results are computed in plain Python per
example; one Spark job each, small max_examples (job latency
dominates)."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_data_warehouse_spark.operators.dedup import setsim_join_prefix

# small token alphabet → heavy overlap → boundary-grazing Jaccards
corpus_st = st.dictionaries(
    st.integers(min_value=1, max_value=9),
    st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
    min_size=2,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(corpus_st, st.sampled_from([(1, 2), (3, 5), (2, 3), (9, 10)]))
def test_prefix_filter_is_lossless(spark, corpus, tau):
    tau_num, tau_den = tau
    rows = [(i, t) for i, ts in corpus.items() for t in ts]
    tok = spark.createDataFrame(rows, "doc_id bigint, token string")
    got = {
        (r["id_a"], r["id_b"], r["inter"], r["union_sz"])
        for r in setsim_join_prefix(tok, "doc_id", "token", tau_num, tau_den).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(corpus), 2):
        inter = len(corpus[a] & corpus[b])
        union = len(corpus[a] | corpus[b])
        if tau_den * inter >= tau_num * union:
            want.add((a, b, inter, union))
    assert got == want
