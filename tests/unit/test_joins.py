"""As-of join and skew-salted join semantics on hand-computed fixtures."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators.joins import asof_join, salted_join


def _ts(m):
    return datetime(2024, 1, 1, 10, m)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(20), "e2"), (2, _ts(5), "e3"), (3, _ts(5), "e4")],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(10), 20.0), (2, _ts(6), 30.0)],
        "k bigint, rts timestamp, price double",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rts", "price"]).toPandas()
    got = {r.tag: (None if r.price != r.price else r.price) for r in out.itertuples()}
    # e1: newest right at/before 10:05 is 10:00 → 10.0
    # e2: 10:10 → 20.0;  e3: right is AFTER the event → null;  e4: no key
    assert got == {"e1": 10.0, "e2": 20.0, "e3": None, "e4": None}
    assert len(out) == 4  # left-join semantics: every left row survives


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, _ts(10), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(10), 5.0)], "k bigint, rts timestamp, price double")
    out = asof_join(left, right, "k", "ts", "rts", ["price"]).collect()
    assert out[0].price == 5.0  # ts >= rts is inclusive


def test_asof_null_field_does_not_mix_versions(spark):
    # newest right row has price=NULL: the match must report NULL, not
    # resurrect the older row's price
    left = spark.createDataFrame([(1, _ts(20), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0, "old"), (1, _ts(10), None, "new")],
        "k bigint, rts timestamp, price double, ver string",
    )
    row = asof_join(left, right, "k", "ts", "rts", ["price", "ver"]).collect()[0]
    assert row.ver == "new" and row.price is None


def test_salted_join_equals_plain_join(spark):
    # 90% of big rows share one hot key — the salted result must still
    # be row-identical to the plain join
    big = spark.createDataFrame(
        [(i, 1 if i % 10 else 2) for i in range(1000)], "row_id bigint, k bigint"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "miss")], "k bigint, name string")
    plain = big.join(small, "k").select("row_id", "k", "name").toPandas()
    salted = salted_join(big, small, "k", salt_n=8).select("row_id", "k", "name").toPandas()
    key = lambda d: sorted(map(tuple, d.itertuples(index=False)))  # noqa: E731
    assert key(salted) == key(plain)


def test_asof_null_right_ts_never_matches(spark):
    # ts >= NULL is no match in ASOF semantics — a NULL-ts right row
    # must not be carried forward to any left row
    left = spark.createDataFrame([(1, _ts(10), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k bigint, rts timestamp, price double"
    )
    row = asof_join(left, right, "k", "ts", "rts", ["price"]).collect()[0]
    assert row.price is None


def test_asof_tied_right_ts_deterministic(spark):
    # two right versions at the same (key, ts): the carried one must be
    # the same on every run (deterministic hash tiebreak)
    left = spark.createDataFrame([(1, _ts(20), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(10), 2.0)], "k bigint, rts timestamp, price double"
    )
    got = {
        asof_join(left, right.repartition(p), "k", "ts", "rts", ["price"]).collect()[0].price
        for p in (1, 2, 7)
    }
    assert len(got) == 1  # same winner regardless of physical layout


def test_salted_join_rejects_right_and_full(spark):
    big = spark.createDataFrame([(1, 1)], "row_id bigint, k bigint")
    small = spark.createDataFrame([(1, "a")], "k bigint, name string")
    import pytest

    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt_n=4, how=how)


def test_salted_join_left_keeps_unmatched_big_once(spark):
    big = spark.createDataFrame([(1, 1), (2, 99)], "row_id bigint, k bigint")
    small = spark.createDataFrame([(1, "a")], "k bigint, name string")
    out = salted_join(big, small, "k", salt_n=4, how="left").toPandas()
    assert len(out) == 2
    assert out[out.k == 99].name.isna().all()


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(i, 1) for i in range(100)], "row_id bigint, k bigint")
    small = spark.createDataFrame([(1, "hot")], "k bigint, name string")
    salted = salted_join(big, small, "k", salt_n=8)
    # the physical join key must include the salt → one hot key spreads
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert salted.count() == 100


def test_cogrouped_asof_matches_native(spark):
    # the cogrouped applyInPandas twin must agree with the native
    # union+window asof_join on every row (right side unique per
    # (key, ts) so both tie rules coincide)
    from demo_data_warehouse_spark.operators.joins import asof_join_cogrouped

    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(20), "e2"), (2, _ts(5), "e3"), (3, _ts(5), "e4")],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(10), 20.0), (2, _ts(6), 30.0)],
        "k bigint, rts timestamp, price double",
    )
    native = asof_join(left, right, "k", "ts", "rts", ["rts", "price"])
    cg = asof_join_cogrouped(left, right, "k", "ts", "rts", ["rts", "price"])
    key = lambda r: (r["k"], r["tag"])  # noqa: E731
    n = {key(r): (r["rts"], r["price"]) for r in native.collect()}
    c = {key(r): (r["rts"], r["price"]) for r in cg.collect()}
    assert n == c and len(c) == 4


def test_cogrouped_asof_left_only_key(spark):
    from demo_data_warehouse_spark.operators.joins import asof_join_cogrouped

    left = spark.createDataFrame([(9, _ts(1), "solo")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame([], "k bigint, rts timestamp, price double")
    row = asof_join_cogrouped(left, right, "k", "ts", "rts", ["price"]).collect()[0]
    assert row.tag == "solo" and row.price is None


def test_interval_overlap_matches_naive(spark):
    from demo_data_warehouse_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(30)), (1, 11, _ts(50), _ts(55)), (2, 12, _ts(0), _ts(30))],
        "k bigint, lid bigint, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        # overlaps lid=10; touches lid=10's end exactly (half-open: no);
        # overlaps lid=11 across an hour-bucket boundary via span
        [(1, 20, _ts(29), _ts(40)), (1, 21, _ts(30), _ts(45)),
         (1, 22, _ts(54), datetime(2024, 1, 1, 11, 10)), (3, 23, _ts(0), _ts(5))],
        "k bigint, rid bigint, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(left, right, "k", "ls", "le", "rs", "re")
    got = sorted((r.lid, r.rid, r.overlap_us) for r in out.collect())
    # lid10×rid20: [29,30) = 60s; lid11×rid22: [54,55) = 60s
    assert got == [(10, 20, 60_000_000), (11, 22, 60_000_000)]


def test_interval_overlap_no_nested_loop(spark, sf_dir):
    import __spark_entry__ as m

    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = m.queries()["join_interval_overlap"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan, plan


def test_interval_overlap_property_matches_naive(spark):
    # randomized (seeded) cross-check: bucketed interval join must equal
    # the naive inequality join for arbitrary interval layouts,
    # including zero-length and bucket-straddling intervals
    import random

    from demo_data_warehouse_spark.operators.joins import interval_overlap_join

    rng = random.Random(7)
    base = datetime(2024, 1, 1).timestamp()

    def mk(side, n):
        rows = []
        for i in range(n):
            k = rng.randint(1, 5)
            start = datetime.fromtimestamp(base + rng.randint(0, 6 * 3600))
            end = datetime.fromtimestamp(
                start.timestamp() + rng.choice([1, 60, 1800, 3600, 7200])
            )
            rows.append((k, side * 1000 + i, start, end))
        return rows

    left = spark.createDataFrame(mk(1, 40), "k bigint, lid bigint, ls timestamp, le timestamp")
    right = spark.createDataFrame(mk(2, 40), "k bigint, rid bigint, rs timestamp, re timestamp")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(left, right, "k", "ls", "le", "rs", "re").collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right,
            (left["k"] == right["k"]) & (left["ls"] < right["re"]) & (right["rs"] < left["le"]),
        ).collect()
    )
    assert got == naive


def test_cogrouped_asof_key_in_right_cols(spark):
    # ADVICE r4: listing the join key in right_cols must not produce a
    # duplicate-labeled pandas frame inside merge_asof
    from demo_data_warehouse_spark.operators.joins import asof_join_cogrouped

    left = spark.createDataFrame(
        [(1, _ts(5), "e1")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0)], "k bigint, rts timestamp, price double"
    )
    out = asof_join_cogrouped(left, right, "k", "ts", "rts", ["k", "price"]).collect()
    assert len(out) == 1 and out[0].price == 10.0


def test_cogrouped_asof_null_right_key(spark):
    # ADVICE r4: a null right-side key must be dropped, not crash the
    # integer key-dtype cast
    from demo_data_warehouse_spark.operators.joins import asof_join_cogrouped

    left = spark.createDataFrame(
        [(1, _ts(5), "e1")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(None, _ts(0), 99.0), (1, _ts(0), 10.0)],
        "k bigint, rts timestamp, price double",
    )
    out = asof_join_cogrouped(left, right, "k", "ts", "rts", ["price"]).collect()
    assert len(out) == 1 and out[0].price == 10.0


def test_cogrouped_asof_property_matches_native(spark):
    # randomized law: cogrouped == native over seeded fixtures covering
    # null right keys, null right timestamps, keys on one side only,
    # and duplicate left timestamps (right unique per (k, rts) so the
    # two tie rules coincide). Seeded loop, not hypothesis: each case
    # costs two Spark jobs, so a handful of diverse draws beats many.
    import random

    from demo_data_warehouse_spark.operators.joins import asof_join_cogrouped

    for seed in range(4):
        rng = random.Random(seed)
        lrows = [
            (rng.randint(1, 6), _ts(rng.randint(0, 50)), f"e{i}")
            for i in range(rng.randint(1, 30))
        ]
        seen = set()
        rrows = []
        for _ in range(rng.randint(0, 25)):
            k = rng.choice([None] + list(range(1, 8)))
            ts = rng.choice([None, _ts(rng.randint(0, 50))])
            if (k, ts) in seen:
                continue
            seen.add((k, ts))
            rrows.append((k, ts, float(rng.randint(1, 100))))
        left = spark.createDataFrame(lrows, "k bigint, ts timestamp, tag string")
        right = spark.createDataFrame(rrows, "k bigint, rts timestamp, price double")
        native = asof_join(left, right, "k", "ts", "rts", ["price"])
        cg = asof_join_cogrouped(left, right, "k", "ts", "rts", ["price"])
        n = {r["tag"]: r["price"] for r in native.collect()}
        c = {r["tag"]: r["price"] for r in cg.collect()}
        assert n == c, (seed, {t: (n.get(t), c.get(t)) for t in set(n) | set(c) if n.get(t) != c.get(t)})
