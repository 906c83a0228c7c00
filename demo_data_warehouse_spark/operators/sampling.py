"""Deterministic sampling operators for training-data pipelines.

Random sampling is useless in a reproducible pipeline (and unverifiable
against an oracle): both operators key every decision off a content
hash, so any engine — and any re-run, at any parallelism — produces the
same sample.

  stratified_sample   first n rows per stratum in md5(id) order — a
                      window top-n per key: one shuffle on the stratum,
                      per-partition heap, no global sort
  hash_split          train/test assignment by hash prefix — a pure
                      projection (no shuffle, no state, stable under
                      re-partitioning), the standard way to split a
                      100 TB corpus without a coordinated RNG
  group_hash_split    hash_split keyed on a GROUP column (domain/URL/
                      author), so every row of a group lands in the
                      same split — the leakage guard row-level splits
                      miss when near-duplicates share a group
  temperature_targets per-source row budgets under temperature-scaled
                      mixture reweighting (p_i ∝ n_i^(1/T)) with exact
                      largest-remainder rounding — the pretraining
                      data-mixing allocator
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum (fewer when the stratum is smaller),
    chosen deterministically: the n smallest md5(id) per stratum.

    md5 of the id string is engine-portable (same bytes in Spark and
    any SQL oracle) and uniform, so this is an unbiased fixed-size
    sample that never changes across runs or engines.
    """
    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame, id_col: str, test_hex_prefixes: int = 1
) -> DataFrame:
    """Deterministic train/test split: rows whose md5(id) starts with
    one of the first `test_hex_prefixes` hex digits go to 'test'
    (fraction ≈ test_hex_prefixes/16), the rest to 'train'.

    A pure narrow projection — the split survives repartitioning,
    incremental appends, and engine changes, unlike randomSplit.
    """
    first = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    hexdigits = "0123456789abcdef"[:test_hex_prefixes]
    return df.withColumn(
        "split",
        F.when(first.isin(*list(hexdigits)), F.lit("test")).otherwise(F.lit("train")),
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col, *, max_weight: float = 1.0
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row iff
    u01(id) < weight, where u01 is a uniform [0,1) value derived from
    the row's content hash (first 15 md5 hex chars / 2^60) — the
    quality-weighted corpus downsampling step of a training pipeline.

    Same guarantees as the other samplers: engine-portable (md5),
    reproducible at any parallelism, stable under appends — each row's
    fate depends only on its own id and weight. Expected kept fraction
    = E[min(weight, max_weight)]."""
    u01 = F.expr(
        f"cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) as bigint)"
        " / 1152921504606846976.0"  # 2^60
    )
    w = F.least(weight_col, F.lit(max_weight))
    return df.where(u01 < w)


def pack_greedy_bins(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Assign documents to fixed token-budget training bins ("sequence
    packing"): walk documents in id order, cut a new bin whenever the
    running token total crosses `budget`. bin_id = floor(tokens-before-
    this-doc / budget), i.e. a document whose prefix sum straddles a
    boundary opens the bin it starts in (documents are not split).

    Scale design: a single global ORDER BY would funnel 100 TB through
    one reducer, so packing is per shard — shard = id % n_shards, and
    the running sum is a window PARTITIONED BY shard. Shards pack
    independently (bin ids are per-shard), which is exactly what a
    1000-executor training-data job wants: n_shards independent
    sorted streams, no global coordination, deterministic output.

    Returns (id, shard, n_tokens, bin_id).
    """
    t = F.col(tokens_col).cast("bigint")
    shard = (F.col(id_col) % n_shards).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), shard.alias("shard"), t.alias("n_tokens"))
        .withColumn(
            "bin_id",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)),
        )
    )


def group_hash_split(
    df: DataFrame, group_col: str, test_hex_prefixes: int = 1
) -> DataFrame:
    """Leakage-safe train/test split: the md5 prefix of the GROUP key
    (domain, URL, author…) decides the split, so every row of a group
    lands on the same side. Row-level splits leak when near-duplicate
    documents from one source straddle the boundary — the standard
    eval-contamination failure; grouping the decision removes it.

    Same guarantees as hash_split: pure projection, no shuffle, stable
    under appends/repartitioning, engine-portable (md5).
    """
    first = F.substring(F.md5(F.col(group_col).cast("string")), 1, 1)
    hexdigits = "0123456789abcdef"[:test_hex_prefixes]
    return df.withColumn(
        "split",
        F.when(first.isin(*list(hexdigits)), F.lit("test")).otherwise(F.lit("train")),
    )


def temperature_targets(
    df: DataFrame, source_col: str, budget: int, inv_temperature_pow: float = 0.5
) -> DataFrame:
    """Per-source row budgets under temperature-scaled mixture
    reweighting — the pretraining data-mixing allocator (multilingual /
    multi-corpus sampling à la T5/XLM: p_i ∝ n_i^(1/T), 1/T here as
    `inv_temperature_pow`; 1.0 = proportional, 0.0 = uniform).

    Exactness contract: weights are 6dp-rounded micro-units of
    pow(n_i, 1/T) (one pow per SOURCE, engines agree after rounding),
    and the budget is apportioned by integer largest-remainder —
    floor(budget·w_i/W) plus one extra row for the `leftover` largest
    remainders (ties broken by source name). Targets are capped at n_i
    (sampling without replacement). Σ target_i == budget whenever
    budget ≤ Σ n_i and no cap binds.

    Scale: the census is a |sources|-row aggregate (map-side combined);
    everything after runs on census rows only.

    Returns (source, n_rows, target).
    """
    census = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_rows")
    )
    w = F.round(F.pow(F.col("n_rows").cast("double"), F.lit(inv_temperature_pow)) * 1e6).cast(
        "bigint"
    )
    weighted = census.withColumn("w", w)
    # single tiny crossJoin of the 1-row total onto the census
    # "w_total", not "W": column resolution is case-insensitive
    totals = weighted.agg(F.sum("w").alias("w_total"))
    j = weighted.crossJoin(F.broadcast(totals))
    # integer `div`, not float `/`+floor: budget·w can exceed 2^53 at
    # real budgets, where double division silently mis-floors
    ranked = j.select(
        "source",
        "n_rows",
        (F.lit(budget).cast("bigint") * F.col("w")).alias("num"),
        F.col("w_total"),
    ).select(
        "source",
        "n_rows",
        F.expr("num div w_total").alias("base"),
        F.expr("num % w_total").alias("rem"),
    )
    wdw = Window.orderBy(F.col("rem").desc(), F.col("source"))
    leftover_expr = F.lit(budget) - F.sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ranked.select(
        "source",
        "n_rows",
        F.least(
            F.col("n_rows"),
            F.col("base")
            + F.when(F.row_number().over(wdw) <= leftover_expr, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .cast("bigint")
        .alias("target"),
    )


def temperature_sample(
    df: DataFrame, id_col: str, source_col: str, budget: int, inv_temperature_pow: float = 0.5
) -> DataFrame:
    """Materialize the temperature mix: per source keep the `target`
    rows with the smallest md5(id) — deterministic, engine-portable,
    append-stable for surviving rows of unchanged sources.

    Scale: one shuffle on source for the per-source rank (skew caveat:
    a mega-source ranks on one reducer chain — swap the exact rank for
    a u01(id) < target/n threshold when ±√n count error is acceptable);
    the |sources|-row target table is broadcast.
    """
    targets = temperature_targets(df, source_col, budget, inv_temperature_pow)
    rk = F.row_number().over(
        Window.partitionBy(source_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    )
    return (
        df.withColumn("rk", rk)
        .join(F.broadcast(targets), on=F.col(source_col) == F.col("source"))
        .where(F.col("rk") <= F.col("target"))
        .drop("rk", "source", "n_rows", "target")
    )
