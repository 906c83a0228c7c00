"""Physical-plan regression tests — the 100 TB scale contract.

Each test pins a plan property that is invisible to result-correctness
checks but decides whether the query survives a 1000-executor, 100 TB
run: filters reaching the parquet scan, dims broadcasting instead of
shuffling the fact side, hot paths staying in whole-stage codegen, and
projections pruning the scan schema.
"""

from __future__ import annotations

import pytest

from demo_data_warehouse_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_rowwise_python,
    assert_pushed_filters,
    assert_wholestage_codegen,
    scan_read_schema,
)


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as m

    return m.queries()


def test_scan_filter_pushdown(spark, sf_dir, qs):
    df = qs["scan_filter"](spark, sf_dir)
    assert_pushed_filters(df, "o_orderstatus")


def test_watermark_filter_pushdown(spark, sf_dir, qs):
    # P8: the incremental watermark predicate must prune parquet
    # row-groups, or every cron tick rescans the full history.
    df = qs["filter_watermark"](spark, sf_dir)
    assert_no_rowwise_python(df)


def test_join_multihop_broadcasts_dims(spark, sf_dir, qs):
    # J3: lineitem ⟕ orders ⟕ customer — the dim sides must broadcast;
    # a sort-merge join here shuffles the fact table twice.
    df = qs["join_multihop"](spark, sf_dir)
    assert_broadcast_join(df, count=1)
    assert_no_rowwise_python(df)


def test_flagship_stays_jvm_side(spark, sf_dir, qs):
    df = qs["flagship_report"](spark, sf_dir)
    assert_no_rowwise_python(df)
    assert_wholestage_codegen(df)


def test_agg_group_partial_aggregation(spark, sf_dir, qs):
    # A3: map-side partial agg before the shuffle — two HashAggregate
    # nodes (partial + final). Without it the full fact table shuffles.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["agg_group"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert_no_rowwise_python(df)


def test_project_cast_prunes_columns(spark, sf_dir, qs):
    # P1: a narrow projection must reach the scan as a narrow ReadSchema,
    # not read all 16 lineitem columns.
    df = qs["project_cast"](spark, sf_dir)
    schemas = scan_read_schema(df)
    assert schemas, "no file scan in plan"
    assert all(ln.count(",") < 8 for ln in schemas), schemas


def test_text_ops_stay_jvm_side(spark, sf_dir, qs):
    for name in ("text_tokens", "text_quality", "text_langid", "dedup_exact"):
        assert_no_rowwise_python(qs[name](spark, sf_dir))


def test_nested_parse_fallback_is_arrow_not_rowwise(spark):
    # F2: the literal_eval fallback must be an Arrow-batched pandas UDF
    # (ArrowEvalPython), never pickled row loops (BatchEvalPython).
    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.functions.nested import parse_pyrepr

    df = spark.createDataFrame([("[{'id': 'a', 'name': 'b'}]",)], "cell string")
    out = df.select(parse_pyrepr(F.col("cell"), "array<struct<id:string,name:string>>"))
    assert_no_rowwise_python(out)


def test_lsh_candidate_joins_are_equi_not_cartesian(spark, sf_dir, qs):
    # The scale contract of every LSH dedup: candidates come from an
    # equi-join on bucket keys. A CartesianProduct here is O(n²) and
    # means the banding is broken.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("dedup_minhash", "dedup_embed_lsh", "dedup_simhash"):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)


def test_rollup_grouping_sets_single_pass(spark, sf_dir, qs):
    # ROLLUP/GROUPING SETS must plan as one Expand + one shuffle, not a
    # self-union of separate aggregations (k scans of the fact table).
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("agg_rollup", "agg_grouping_sets", "agg_cube"):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "Expand" in plan, (name, plan)
        # formatted explain lists each node in the tree AND the details
        # section — count numbered detail nodes only
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, (name, plan)
        assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, (name, plan)


def test_set_ops_stay_jvm_side(spark, sf_dir, qs):
    for name in ("set_intersect", "set_except"):
        assert_no_rowwise_python(qs[name](spark, sf_dir))


def test_ivf_assignment_is_map_only(spark, sf_dir, qs):
    # IVF cell assignment must be a MAP-ONLY pass: one Arrow-batched
    # argmax over the closure-carried centroid matrix — no join, no
    # n·|cells| row fan-out, and crucially no Exchange (shuffling the
    # corpus to assign cells would be absurd at 100 TB; the earlier
    # broadcast-join + max_by shape paid an n·|cells| materialization
    # that dominated sqrt(n)-sized quantizers).
    from demo_data_warehouse_spark.operators import similarity

    rows = [(i, [float(i), 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(similarity.ivf_assign(df, "vec_id", "embedding", cents))
    assert "ArrowEvalPython" in plan, plan
    for forbidden in ("Join", "CartesianProduct", "Exchange", "HashAggregate"):
        assert forbidden not in plan, (forbidden, plan)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # Co-located join: both sides bucketed on the join key → the
    # SortMergeJoin consumes the scans' hashpartitioning directly;
    # any Exchange in the plan means the write-time shuffle was wasted.
    import re

    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.catalog import table as t
    from demo_data_warehouse_spark.io import Warehouse
    from demo_data_warehouse_spark.plans.checks import physical_plan

    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    wh.write_bucketed(orders, "silver", "orders_b", ["o_custkey"], buckets=8)
    wh.write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "silver", "cust_b",
        ["o_custkey"], buckets=8,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = wh.read_catalog_table("silver", "orders_b").join(
            wh.read_catalog_table("silver", "cust_b"), "o_custkey"
        ).agg(F.count("*").alias("n"))
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan, plan
        # no Exchange below the join (the agg above it may still have one)
        join_details = re.findall(r"\(\d+\) Exchange\n.*?Arguments: (.*)", plan)
        assert all("hashpartitioning(o_custkey" not in a for a in join_details), plan
        assert j.collect()[0].n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS silver.orders_b")
        spark.sql("DROP TABLE IF EXISTS silver.cust_b")


def test_scd2_single_join_no_recompute(spark, sf_dir, qs):
    # The SCD2 delta must come out of ONE join over each input computed
    # once: 2 input shuffles (the two per-user windows) and 2 scans.
    # The naive union-of-three-joins shape re-scans and re-shuffles both
    # inputs per leg (6 Exchanges, 6 scans) — 3× the IO at 100 TB.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["scd2_delta"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_ivf_indexed_probe_prunes_cell_partitions(spark, tmp_path):
    # The IVF scale contract: probing a materialized index must be
    # directory-level partition pruning (PartitionFilters on `cell`),
    # not a filter over a full corpus scan — at 100 TB this is the
    # difference between reading n_probe cells and reading everything.
    from demo_data_warehouse_spark.operators import similarity
    from demo_data_warehouse_spark.plans.checks import physical_plan

    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = similarity.ivf_train_centroids(df, "embedding", n_cells=4, sample_rows=64)
    idx = str(tmp_path / "ivf")
    similarity.ivf_write_index(df, "vec_id", "embedding", cents, idx)
    top = similarity.cosine_topk_ivf_indexed(
        spark, idx, "vec_id", "embedding", [1.0, 0.5, 1.0], cents, k=5, n_probe=2
    )
    plan = physical_plan(top)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell" in ln for ln in pf), plan
    assert top.count() == 5


def test_ann_topk_avoids_global_sort(spark, sf_dir, qs):
    # top-k must be TakeOrderedAndProject (per-partition heap + merge),
    # not a full Sort of every cosine score.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["ann_cosine_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_range_join_broadcasts_band_dim(spark, sf_dir, qs):
    # join_range: the non-equi condition must run as a broadcast nested
    # loop against the tiny band dim — a shuffled big x big theta join
    # would be quadratic at 100 TB.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["join_range"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigrams_single_shuffle_topk(spark, sf_dir, qs):
    # text_bigrams: word-count shape — generator + partial count map-side,
    # one shuffle, TakeOrdered for the top-k (never a global sort).
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["text_bigrams"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange (") <= 1, plan  # the partial->final agg shuffle
    assert "BatchEvalPython" not in plan, plan


def test_explode_is_shuffle_free(spark, sf_dir, qs):
    # fn_explode: a per-row generator must not introduce any exchange.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["fn_explode"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Generate" in plan, plan
    assert "Exchange" not in plan, plan


def test_window_rank_single_window_operator(spark, sf_dir, qs):
    # window_rank: all three ranking functions share one window spec ->
    # exactly one Window node, one shuffle.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["window_rank"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Window (") == 1, plan
    # exactly one partitionBy shuffle feeds all three ranking functions
    assert plan.count("Exchange (") == 1, plan


def test_star_agg_broadcasts_fixed_dims(spark, sf_dir, qs):
    # join_star_agg: region/nation (fixed 5/25 rows) must broadcast;
    # selective filters must reach the scans.
    df = qs["join_star_agg"](spark, sf_dir)
    assert_broadcast_join(df, count=1)
    assert_pushed_filters(df, "r_name")


def test_subquery_scalar_no_rowwise(spark, sf_dir, qs):
    df = qs["subquery_scalar"](spark, sf_dir)
    assert_no_rowwise_python(df)


def test_portable_dedup_joins_are_equi_not_cartesian(spark, sf_dir, qs):
    # portable-hash minhash/simhash candidate generation must stay
    # bucket-equi-joined (no cross product) exactly like fast mode.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("dedup_minhash", "dedup_simhash"):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_join_bucketed_query_no_join_exchange(spark, sf_dir, qs):
    # join_bucketed: the bucketed scans must feed the join (and the
    # same-key agg above it) without any hashpartitioning exchange on
    # the bucket key.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["join_bucketed"](spark, sf_dir))
    details = re.findall(r"\(\d+\) Exchange\n.*?Arguments: (.*)", plan)
    assert all("hashpartitioning(o_custkey" not in a for a in details), plan


def test_partition_prune_reads_one_partition(spark, sf_dir, qs):
    # scan_partition_prune: the date predicate must land in
    # PartitionFilters (directory pruning), not just PushedFilters.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["scan_partition_prune"](spark, sf_dir))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("event_date" in ln for ln in pf), plan


def test_subquery_exists_decorrelates_to_semi_anti(spark, sf_dir, qs):
    # Correlated EXISTS / NOT EXISTS must become semi/anti hash joins
    # on the correlation key — a nested-loop re-execution per outer row
    # is the classic correlated-subquery scale failure.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["subquery_exists"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_connected_components_rounds_are_equijoins(spark, sf_dir):
    # One propagation round = edge equi-join + groupBy; never a cross
    # product (the thing that would make label propagation quadratic).
    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.plans.checks import physical_plan

    sym = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    labels = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id bigint, comp bigint")
    prop = sym.join(labels, sym["src"] == labels["id"]).select(
        F.col("dst").alias("id"), F.col("comp")
    )
    one_round = (
        labels.unionByName(prop).groupBy("id").agg(F.min("comp").alias("comp"))
    )
    plan = physical_plan(one_round)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dq_profile_single_scan(spark, sf_dir, qs):
    # Profiling N columns must stay ONE pass over the table (a
    # multi-aggregate row later pivoted to per-column rows) — a
    # per-column scan loop is N× the IO at 100 TB.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["dq_profile"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_check_rules_is_shuffle_free(spark, sf_dir):
    # Rule tagging is a pure projection: no Exchange, no Python.
    from pyspark.sql import functions as F

    from demo_data_warehouse_spark.catalog import table
    from demo_data_warehouse_spark.operators.quality import check_rules
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = check_rules(
        table(spark, sf_dir, "events"), {"v_pos": F.col("value") > 0}
    )
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_table_diff_single_copartitioned_join(spark, sf_dir, qs):
    # Snapshot reconciliation is ONE full-outer join: each snapshot
    # shuffles on the key at most once (2 Exchanges), never more.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["table_diff"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_merge_shuffles_state_not_facts(spark, sf_dir, qs):
    # The rollup-maintenance plan: facts are partially aggregated
    # map-side BEFORE any exchange (the shuffle moves |groups|-sized
    # state), and the state merge is itself a partial+final agg. A plan
    # that exchanged raw fact rows would show an Exchange directly over
    # a scan with no intervening HashAggregate.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["agg_incremental"](spark, sf_dir))
    # every Exchange hashpartitioning must sit above a HashAggregate
    # (partial), never directly above a scan
    blocks = re.split(r"\n(?=\(\d+\))", plan)
    ids = {}
    for b in blocks:
        m = re.match(r"\((\d+)\) (\w+)", b)
        if m:
            ids[int(m.group(1))] = m.group(2)
    order = sorted(ids)
    for i, node in enumerate(order):
        if ids[node] == "Exchange":
            below = [ids[n] for n in order[i + 1 :]]
            assert "HashAggregate" in below[:3] or "Scan" not in below[:1], plan


def test_sessionize_single_window_shuffle(spark, sf_dir, qs):
    # window_sessionize: the gap flag (lag) and the running session
    # counter share one (user_id)-partitioned sort — exactly one
    # exchange; a second would mean the window spec split.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["window_sessionize"](spark, sf_dir))
    assert plan.count("Exchange (") <= 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_tfidf_no_self_join_on_corpus(spark, sf_dir, qs):
    # text_tfidf: doc length comes from a window over the tf table, the
    # df/N sides broadcast — the token stream is aggregated once and
    # never self-joined by a shuffled join.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["text_tfidf"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_chunking_is_shuffle_free(spark, sf_dir, qs):
    # text_chunks: pure per-row generator — no exchange at any width.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["text_chunks"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_embed_projection_ops_shuffle_free(spark, sf_dir, qs):
    # embed_quantize: per-vector projection — no exchange, JVM-native.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["embed_quantize"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_corpus_clean_broadcasts_eval_side(spark, sf_dir, qs):
    # corpus_clean: the composed cleaning pipeline must keep the eval
    # shingle set broadcast (no shuffled join against the corpus) and
    # stay fully JVM-side.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    plan = physical_plan(qs["corpus_clean"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_agg_histogram_partial_aggregation(spark, sf_dir, qs):
    # R1: one scan, map-side combine, |bins|-row shuffle — two
    # HashAggregate nodes, no Python anywhere.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["agg_histogram"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert_no_rowwise_python(df)


def test_simhash_signature_not_reexecuted_per_bit(spark, sf_dir, qs):
    # the signature must be ONE token-hash pass aggregated into per-bit
    # sums — not the nested-fold form Catalyst inlines into a per-bit
    # re-hash (the round-3 108s regression). The interpreted fold shows
    # up as zip_with/aggregate lambdas in the plan; the rewritten path
    # has none.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["dedup_simhash"](spark, sf_dir)
    plan = physical_plan(df)
    assert "zip_with" not in plan, "per-token fold is back in the plan"
    assert_no_rowwise_python(df)


def test_embed_cosine_scoring_is_arrow_not_rowwise(spark, sf_dir, qs):
    # the O(n²) scorer must be Arrow-batched (ArrowEvalPython), never
    # BatchEvalPython, and candidate generation must stay a join (no
    # interpreted per-pair lambdas in a Filter above a cross product).
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["dedup_embed_cosine"](spark, sf_dir)
    plan = assert_no_rowwise_python(df)
    assert "ArrowEvalPython" in plan or "EvalPython" not in plan, plan


def test_char_entropy_shuffles_counts_not_chars(spark, sf_dir, qs):
    # the entropy shuffle must move (id, char) COUNTS (post map-side
    # combine), so the plan needs partial+final HashAggregates and no
    # per-distinct-char refilter (higher-order `filter(` lambda) in a
    # projection.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["text_entropy"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "array_distinct" not in plan, "per-char refilter form is back"
    assert_no_rowwise_python(df)


def test_basket_pairs_equi_join_only(spark, sf_dir, qs):
    # pair generation must ride the basket equi-key — a cartesian or
    # nested-loop pair join is the O(n²) failure mode
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["agg_basket_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan, plan
    assert_no_rowwise_python(df)


def test_funnel_broadcasts_stage_anchors(spark, sf_dir, qs):
    # each funnel stage joins the fact table to user-level anchors —
    # those must broadcast, never shuffle the fact side
    df = qs["window_funnel"](spark, sf_dir)
    assert_broadcast_join(df, count=2)
    assert_no_rowwise_python(df)


def test_disjunctive_predicate_reaches_both_scans(spark, sf_dir, qs):
    # Q19 shape: Catalyst must push the per-side unions of the OR-of-ANDs
    # into BOTH parquet scans — the part scan gets the brand/size
    # disjunction, the lineitem scan the quantity-band disjunction. If
    # either PushedFilters goes empty the scan reads every row-group.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["filter_disjunctive"](spark, sf_dir)
    plan = physical_plan(df)
    import re

    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "p_brand" in pushed and "p_size" in pushed, plan
    assert "l_quantity" in pushed, plan
    assert_no_rowwise_python(df)


def test_returned_topk_is_takeordered_with_broadcast_dim(spark, sf_dir, qs):
    # Q10 shape: top-20 must compile to TakeOrderedAndProject (per-
    # partition heap + single merge), never a global Sort; nation
    # broadcasts.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["join_returned_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrdered" in plan, plan
    assert_broadcast_join(df, count=1)
    assert_no_rowwise_python(df)


def test_tpch_completion_no_cartesian_no_python(spark, sf_dir, qs):
    # The scalar-subquery shapes (global total, segment average, view
    # max) must plan their one-row sides as broadcasts — a
    # CartesianProduct or row-wise Python node is the 100 TB failure.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in (
        "agg_global_fraction",
        "join_revenue_view_max",
        "subquery_anti_scalar",
        "subquery_avg_threshold",
        "subquery_exists_chain",
        "join_count_distribution",
        "join_market_share",
        "join_profit_rollup",
    ):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_timeseries_stays_jvm_side(spark, sf_dir, qs):
    # EWMA is 12 lag taps of codegen arithmetic; OHLC is rank-tag +
    # conditional agg; lag-corr pushes the event_type filters into the
    # scans. None may fall back to Python or a cartesian spine join.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("ts_ewma", "ts_ohlc_resample", "ts_mad_outlier", "ts_lag_corr"):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert_no_rowwise_python(df)
    plan = physical_plan(qs["ts_lag_corr"](spark, sf_dir))
    assert "EqualTo(event_type,view)" in plan, plan


def test_semantic_and_containment_dedup_are_blocked_joins(spark, sf_dir, qs):
    # dedup_semantic pairs ride the cell equi-key (Σ m_c², not n²);
    # dedup_containment pairs ride the prefix equi-key. The centroid
    # fan-out is an intentional broadcast nested-loop over 8 rows —
    # only an unkeyed CartesianProduct is the failure mode.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("dedup_semantic", "dedup_containment", "filter_quality_linear"):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_round4_additions_blocked_joins_no_python(spark, sf_dir, qs):
    # setsim pairs ride prefix-token buckets, phash pairs ride
    # (block, value) buckets, pagerank rounds are keyed joins —
    # none may plan a cartesian; only the sanctioned Arrow batch
    # (phash decode) may run Python, never row-wise BatchEvalPython.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in (
        "dedup_setsim_prefix",
        "multimodal_phash_dedup",
        "graph_pagerank",
        "window_attribution",
        "agg_percentile_cont",
        "window_pattern_seq",
    ):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_dpp_runtime_partition_filter(spark, sf_dir, qs):
    # the fact scan must carry a dynamicpruningexpression partition
    # filter injected from the dim side — static literal pruning is
    # already pinned by test_partition_prune_reads_one_partition
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["scan_dpp_prune"](spark, sf_dir)
    plan = physical_plan(df)
    assert "dynamicpruning" in plan.lower(), plan
    assert_no_rowwise_python(df)


def test_pq_and_ks_queries_keyed_joins_only(spark, sf_dir, qs):
    # PQ codebook joins ride (s,k)/(s,j) keys and the KS windows ride
    # event_type partitions — no cartesian, no row-wise Python; the
    # coarse-probe centroid fan-out in ann_ivf_pq is the sanctioned
    # 8-row broadcast nested loop, same as ivf_assign
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in ("ann_pq_codes", "dq_ks_drift", "agg_selective_revenue"):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
    # Q6: the stacked predicates must reach the scan
    plan = physical_plan(qs["agg_selective_revenue"](spark, sf_dir))
    assert "l_shipdate" in plan and "PushedFilters" in plan, plan


def test_bloom_runtime_filter_injected(spark, sf_dir, qs):
    # the probe-side (lineitem) scan must carry a
    # might_contain(bloom_filter_agg(dim keys)) semi-filter and the
    # join must be a shuffle join — this is the plan that carries
    # big⋈selective once the dim outgrows broadcast; scan_dpp_prune
    # pins the partition-column sibling
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["join_bloom_runtime"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "bloom_filter_agg" in opt, opt
    assert "might_contain" in opt, opt
    plan = physical_plan(df)
    assert "broadcasthashjoin" not in plan.lower(), plan
    assert_no_rowwise_python(df)
    # and the override must not leak: the next query's wrapper re-pins
    # the broadcast threshold via session.tune
    qs["join_multihop"](spark, sf_dir)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760"


def test_round5_additions_plan_shapes(spark, sf_dir, qs):
    from demo_data_warehouse_spark.plans.checks import physical_plan

    # triangle counting: every step an equi-join — no cartesian, no python
    df = qs["graph_triangles"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert_no_rowwise_python(df)

    # span coverage: census + verdict joins are keyed — no cartesian
    df = qs["dedup_span_coverage"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan

    # CDC apply: per-key latest is an aggregate with a map-side partial
    # (no window sort over the feed)
    # (the query's TARGET prep uses a window legitimately; the feed
    # resolution itself must be aggregate-shaped: partial + final)
    df = qs["merge_cdc_apply"](spark, sf_dir)
    plan = physical_plan(df)
    import re

    assert len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)) >= 2, plan

    # PIT join: the as-of carry-forward — never a range/nested-loop join
    df = qs["join_point_in_time"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    # quantile bucketizer: the window runs over the value census (child
    # of the Window is an aggregate), and the transform side is a
    # broadcast of one row — the fact table is never globally sorted
    df = qs["fn_quantile_bucketize"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row edge broadcast


def test_scan_agg_pushdown_answers_from_footers(spark, sf_dir, qs):
    # COUNT/MIN/MAX must reach the parquet scan as PushedAggregation —
    # at 100 TB that is one footer read per file vs a full column scan.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["scan_agg_pushdown"](spark, sf_dir)
    plan = physical_plan(df)
    assert "PushedAggregation" in plan, plan
    assert "COUNT(*)" in plan and "MIN(o_totalprice)" in plan, plan


def test_partsupp_trio_stays_equi_joined(spark, sf_dir, qs):
    # Q2/Q16/Q20 over the derived partsupp: the correlated subqueries
    # must decorrelate to aggregate+equi-join — a CartesianProduct or
    # BroadcastNestedLoopJoin here is the O(n²) decorrelation failure.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in (
        "subquery_min_cost_supplier",
        "agg_supplier_count_notin",
        "subquery_excess_stock",
    ):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_skyline_two_phase_salted_then_survivors(spark, sf_dir, qs):
    # S109: phase 1 must be the salt-partitioned local prune (32 bounded
    # parallel sorts — Window partitioned by salt), phase 2 the exact
    # pass over survivors; never a cartesian dominance join or Python.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["window_skyline"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Window (") >= 2, plan  # local prune + exact phase
    assert "salt" in plan, plan  # phase 1 partitions by the salt key
    assert "CartesianProduct" not in plan, plan
    assert_no_rowwise_python(df)


def test_spatial_grid_is_broadcast_equi_join(spark, sf_dir, qs):
    # S112: the 2-D nearest join must ride the (cell-lat, cell-lon)
    # EQUI-key with the supplier side broadcast — the only fan-out is
    # the constant x9 neighborhood explode, never |L|x|R| (no nested
    # loop, no cartesian).
    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["join_spatial_grid"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert_no_rowwise_python(df)


def test_cms_rollup_partial_aggregation(spark, sf_dir, qs):
    # S110: sketch cells must combine map-side — partial+final
    # HashAggregate pairs, so the shuffle moves |cells| counters
    # (depth x width bounded), never raw event rows.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["agg_cms_rollup"](spark, sf_dir)
    plan = physical_plan(df)
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert_no_rowwise_python(df)


def test_auto_salt_broadcasts_salted_dim_fact_unshuffled(spark, sf_dir, qs):
    # S127: the exploded dim must broadcast and the fact side must NOT
    # shuffle on the join key — at sf0.001 k degenerates to 1 and the
    # plan is the plain broadcast join (constant salt), same shape.
    import re

    from demo_data_warehouse_spark.plans.checks import physical_plan

    df = qs["join_auto_salt"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    details = re.findall(r"\(\d+\) Exchange\n.*?Arguments: (.*)", plan)
    assert all("hashpartitioning(event_type" not in a for a in details), plan
    assert_no_rowwise_python(df)


def test_tier2_bench_set_no_cartesian_no_rowwise_python(spark, sf_dir, qs):
    # the tier-2 bench headliners (perf-tracked from driver round 4) must
    # keep their scale shapes: keyed joins only, Python confined to
    # sanctioned Arrow batches.
    from demo_data_warehouse_spark.plans.checks import physical_plan

    for name in (
        "maintenance_mv_rewrite",
        "scan_bloom_index",
        "text_inverted_index",
        "ml_dbscan",
        "corpus_curate_mix",
    ):
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython (" not in plan, (name, plan)


def test_bloom_multi_probe_broadcasts_probe_set(spark, sf_dir):
    # the r5 batched probe (bloom_candidate_files_multi): the tiny
    # (value, bit) probe set must BROADCAST against the (file, bit)
    # index — at 100 TB the index is the big side and must never
    # shuffle for a point-lookup batch
    from demo_data_warehouse_spark.operators.bloom_index import (
        _positions_expr,
        build_bloom_index,
        positions_py,
    )
    from demo_data_warehouse_spark.plans.checks import physical_plan
    from demo_data_warehouse_spark.streaming.pipeline import scratch_dir

    import pyspark.sql.functions as F

    data, idx = scratch_dir("bloomp_data"), scratch_dir("bloomp_idx")
    spark.range(0, 2000).select(F.col("id").alias("k")).repartition(8).write.mode(
        "overwrite"
    ).parquet(data)
    build_bloom_index(spark, data, "k", idx)
    values = [3, 977]
    probes = [(str(v), int(b)) for v in values for b in sorted(set(positions_py(v)))]
    pdf = spark.createDataFrame(probes, "value string, bit bigint")
    joined = (
        spark.read.parquet(idx)
        .join(F.broadcast(pdf), "bit")
        .groupBy("value", "file")
        .agg(F.count_distinct("bit").alias("n"))
    )
    plan = physical_plan(joined)
    assert "broadcasthashjoin" in plan.lower(), plan
    # only the post-join aggregation shuffles (count_distinct = its
    # two-phase pair), on the tiny hit set — the index scan itself must
    # feed the broadcast join with no exchange of its own
    assert plan.lower().count("+- exchange") <= 2, plan
    idx_side = plan.lower().split("broadcasthashjoin")[-1]
    scan_section = idx_side.split("broadcastexchange")[0]
    assert "+- exchange" not in scan_section, plan
