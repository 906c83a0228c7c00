"""Bloom index laws: the Python position twin matches the engine
expression, present values are ALWAYS found (no false negatives),
absent values prune to (almost) nothing, and lookups equal plain
filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.bloom_index import (
    _positions_expr,
    bloom_candidate_files,
    bloom_point_lookup,
    build_bloom_index,
    positions_py,
)
from demo_data_warehouse_spark.streaming.pipeline import scratch_dir


def _table(spark):
    data = scratch_dir("bloomt_data")
    idx = scratch_dir("bloomt_idx")
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    df.repartition(12).write.mode("overwrite").parquet(data)
    build_bloom_index(spark, data, "k", idx)
    return data, idx


def test_positions_python_twin_matches_engine(spark):
    for value in (0, 17, 999999, -5):
        got = spark.range(1).select(
            F.expr(_positions_expr(f"cast({value} as bigint)")).alias("p")
        ).collect()[0].p
        assert list(got) == positions_py(value)


def test_positions_twin_and_distinctness_property(spark):
    """Hypothesis-style law over a wide value sample, one engine job:
    (a) the Python twin reproduces the engine positions exactly, and
    (b) double hashing with an odd step under a power-of-two modulus
    never degenerates k positions into one (the h2=0 failure mode of
    naive Kirsch-Mitzenmacher)."""
    values = [*range(-50, 50), *(3**i for i in range(1, 30)), -(2**62), 2**62]
    rows = (
        spark.createDataFrame([(v,) for v in values], "v bigint")
        .select("v", F.expr(_positions_expr("v")).alias("p"))
        .collect()
    )
    assert len(rows) == len(values)
    for r in rows:
        want = positions_py(r.v)
        assert list(r.p) == want, r.v
        assert len(set(want)) > 1, r.v


def test_no_false_negatives_and_filter_equivalence(spark):
    data, idx = _table(spark)
    base = spark.read.parquet(data)
    for k in (0, 1, 499, 2500, 4999):
        rows, n_read, n_total = bloom_point_lookup(spark, data, idx, "k", k)
        got = {(r.k, r.v) for r in rows.collect()}
        want = {(r.k, r.v) for r in base.where(F.col("k") == k).collect()}
        assert got == want and want, k
        assert 1 <= n_read < n_total


def test_absent_value_prunes_everything(spark):
    data, idx = _table(spark)
    # 5000 keys * 7 bits / 12 files ≈ 2.9k of 32768 bits per file:
    # P(all 7 set by accident) ≈ 1e-8 — an absent key matches no file
    for k in (10_000, 123_456, -1):
        assert bloom_candidate_files(spark, idx, k) == []


def test_scheme_tag_guards_probe(spark, tmp_path):
    """A probe against an index whose sidecar is missing or tagged with
    a genuinely DIFFERENT hash scheme must raise (forcing a rebuild),
    never silently compute mismatched positions — a cross-scheme probe
    fails as false negatives, violating the no-false-negatives law.
    An UNTAGGED sidecar that still carries m_bits is implicitly v2
    (the position code is unchanged over the tag-less range; ADVICE
    r7), so it probes identically to a tagged one — no forced rebuild.
    All sidecar mutations restore under try/finally so a mid-test
    assertion failure can't cascade into siblings sharing the scratch
    index (ADVICE r7)."""
    import json
    import os

    import pytest

    from demo_data_warehouse_spark.operators.bloom_index import (
        _META_NAME,
        HASH_SCHEME,
    )

    data, idx = _table(spark)
    meta_path = os.path.join(idx, _META_NAME)
    with open(meta_path) as fh:
        meta = json.load(fh)
    assert meta["hash"] == HASH_SCHEME  # build stamps the scheme
    tagged_files = bloom_candidate_files(spark, idx, 17)

    try:
        # legacy index: sidecar predates the scheme tag but has m_bits —
        # implicitly v2, probes identically (no spurious rebuild)
        with open(meta_path, "w") as fh:
            json.dump({k: v for k, v in meta.items() if k != "hash"}, fh)
        assert bloom_candidate_files(spark, idx, 17) == tagged_files

        # foreign scheme: built by a different hash version
        with open(meta_path, "w") as fh:
            json.dump({**meta, "hash": "md5-per-seed-v1"}, fh)
        with pytest.raises(ValueError, match="md5-per-seed-v1"):
            bloom_candidate_files(spark, idx, 17)

        # pre-metadata index: no sidecar at all
        os.remove(meta_path)
        with pytest.raises(ValueError, match="sidecar"):
            bloom_candidate_files(spark, idx, 17)
    finally:
        # unconditional restore so sibling tests sharing the scratch
        # dir stay valid even if an assertion above fails
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)


def test_multi_probe_equals_single_probes(spark):
    from demo_data_warehouse_spark.operators.bloom_index import (
        bloom_candidate_files_multi,
    )

    data, idx = _table(spark)
    values = [0, 17, 2500, 4999, 10_000, -1]  # present, absent, negative
    got = bloom_candidate_files_multi(spark, idx, values)
    assert set(got) == set(values)
    for v in values:
        assert sorted(got[v]) == sorted(bloom_candidate_files(spark, idx, v)), v
