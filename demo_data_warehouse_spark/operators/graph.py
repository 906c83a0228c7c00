"""Distributed connected components — dedup-cluster resolution.

Near-duplicate detection (minhash/simhash/embedding LSH in
operators/dedup.py) emits PAIRS; turning pairs into dedup decisions
needs the transitive closure: if A~B and B~C, then {A,B,C} is one
cluster and exactly one member survives. This module computes the
components with iterative min-label propagation expressed as DataFrame
joins — no GraphX/graphframes dependency, nothing driver-side except
the convergence counter.

Algorithm (label propagation to fixpoint):
  label(v) starts as v; each round every vertex takes the min of its
  own label and its neighbors' labels; stop when no label changed.
  Rounds needed = the largest cluster's graph diameter. Near-dup
  clusters are dense (LSH emits most intra-cluster pairs directly), so
  diameters are small single digits in practice; `max_iter` bounds the
  worst case and the operator raises if it fails to converge rather
  than returning a half-merged clustering.

Scale notes (100 TB lens):
  - Each round is one shuffle on the edge key plus a groupBy on vertex
    id — both equi-joins, never a cross product; skew lands on the
    same hot-vertex keys every round, so AQE skew-join handles it.
  - `localCheckpoint(eager=True)` truncates lineage every round;
    without it round k replans rounds 1..k-1 and the plan grows
    quadratically. On a real cluster use `spark.sparkContext.
    setCheckpointDir` + `.checkpoint()` for fault tolerance instead —
    localCheckpoint trades re-computability for speed.
  - For adversarial graphs (chains, diameter ~n) the production-grade
    fix is the large-star/small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), which
    converges in O(log n) rounds — implemented below as
    connected_components_star (equivalence + chain convergence pinned
    in tests/unit/test_graph.py). Label propagation remains the dedup
    default because near-dup graphs are diameter-bounded and it needs
    half the shuffles per round.

Beyond-reference operator: the reference (a pandas/Airflow ETL) has no
graph stage; this is part of the LLM-training-data surface the engine
adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) — comp is the min vertex id reachable from `id`.

    nodes: one column, the vertex id (singletons allowed — they come
    back with comp = their own id). edges: columns (src, dst),
    undirected (symmetrized internally, self-loops ignored).
    """
    id_col = nodes.columns[0]
    e = edges.select(F.col("src"), F.col("dst")).where(F.col("src") != F.col("dst"))
    # materialize the symmetrized edge list ONCE: every propagation
    # round joins `sym`, and without this checkpoint each round re-runs
    # the caller's full edge-derivation plan (for the LSH dedup callers
    # that is the whole candidate-pair generation, re-executed per
    # round — the r12 before-profile shows corpus_curate_mix re-running
    # its minhash band join every round). Guide §3.3: materialize an
    # intermediate that many iterations reuse. EAGER on purpose: sym
    # (and labels below) have several consumers inside the round-1 job,
    # and a lazy checkpoint lets concurrent stages each recompute the
    # expensive upstream before blocks land (measured r12: lazy here
    # produced nondeterministic 2-3x walls on ml_dbscan).
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    ckpt = labels
    for _ in range(max_iter):
        # the previous label rides the SAME aggregation as the new one
        # (min over the is_old-tagged rows — labels has one row per id),
        # so convergence detection is a shuffle-free filter+count over
        # the checkpointed result instead of a per-round join job
        old = labels.select("id", "comp", F.lit(True).alias("is_old"))
        prop = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("comp"), F.lit(False).alias("is_old")
        )
        merged = (
            old.unionByName(prop)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("is_old"), F.col("comp"))).alias("prev"),
            )
            # eager=False: the convergence count() right below is the
            # materializing action and merged's ONLY consumer until it
            # completes — one job per round instead of a materialize
            # job followed by a count job (guide §1.2). Next round's
            # two readers then hit the already-persisted blocks.
            .localCheckpoint(eager=False)
        )
        changed = merged.where(F.col("comp") != F.col("prev")).count()
        ckpt.unpersist()
        ckpt = merged
        labels = merged.select("id", "comp")
        if changed == 0:
            return labels.select(F.col("id"), F.col("comp"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds —"
        " the graph has a long-diameter component; raise max_iter or"
        " switch to large-star/small-star for O(log n) convergence"
    )


def cluster_keep_best(
    comps: DataFrame,
    scored: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """One row per cluster: (comp, keeper_id, n_members, keeper_score).

    Keeper = the member with the highest score, ties broken to the
    lowest id (fully deterministic — no engine-dependent arbitrary
    pick). One shuffle on comp; the rank and the count share it.
    """
    from pyspark.sql import Window

    j = comps.join(scored.select(F.col(id_col).alias("id"), F.col(score_col)), "id")
    w = Window.partitionBy("comp").orderBy(F.desc(score_col), F.asc("id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("comp")))
        .where(F.col("rn") == 1)
        .select(
            F.col("comp"),
            F.col("id").alias("keeper_id"),
            F.col("n_members"),
            F.col(score_col).alias("keeper_score"),
        )
    )


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    materialize_edges: bool = False,
) -> DataFrame:
    """(id, pr) — PageRank in integer fixed-point arithmetic, a fixed
    number of synchronous iterations.

    Floating-point PageRank is NOT reproducible on a cluster: the
    per-vertex Σ contribution is a float sum whose partial-aggregation
    order changes run to run. Scaling ranks to integer micro-units
    (pr starts at `scale`) makes every step exact: contribution is
    floor(pr / out_degree) (all ranks positive, so floor == truncate in
    every engine), the damped update is base + (Σ · damp_num) // damp_den
    with base = scale − scale·damp_num//damp_den, and bigint sums are
    order-independent. The result is bit-identical on any partitioning
    and any engine — rank mass leaks ≤ out_degree µunits per vertex per
    round to flooring, a bounded bias no ordering decision ever sees.

    Each iteration: one equi-join of edges to current ranks (both keyed
    by src — co-partitioned under AQE), one groupBy(dst) with map-side
    partial sums, one left join back to the node set (vertices with no
    in-edges keep the base rank). n_iter is fixed, not convergence-
    driven: synchronous fixed-round PageRank is the form every bulk
    system (Pregel) ships, and it keeps the plan finite for Catalyst.
    """
    id_col = nodes.columns[0]
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src")
    if materialize_edges:
        # materialize the degree-annotated edge list ONCE: round k's
        # plan embeds k copies of the edge+degree derivation, and —
        # measured r12 — ReusedExchange does NOT dedup them (the union
        # branches and per-round subtrees canonicalize differently;
        # graph_pagerank's plan showed 106 Exchanges, 0 ReusedExchange),
        # so every round re-ran the full derivation. Eager, per the
        # multi-consumer checkpoint rule (every round's join reads e in
        # the same final job): 23.2 s → 5.6 s at sf0.1 with the
        # caller's pairs checkpoint. On a real cluster prefer
        # checkpoint().
        e = e.localCheckpoint(eager=True)
    base = scale - scale * damp_num // damp_den
    pr = nodes.select(
        F.col(id_col).alias("id"), F.lit(scale).cast("bigint").alias("pr")
    )
    for _ in range(n_iter):
        summed = (
            e.join(pr, e.src == pr.id)
            .select(F.col("dst"), F.expr("pr DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            pr.select("id")
            .join(summed, pr.id == summed.dst, "left")
            .select(
                "id",
                F.expr(
                    f"CAST({base} AS BIGINT) + (coalesce(s, 0) * {damp_num}) DIV {damp_den}"
                ).alias("pr"),
            )
        )
    return pr


def triangle_counts(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    `edges` must be canonical and distinct (a < b, one row per edge).
    Output: (node, n_triangles) for every node in ≥1 triangle.

    Algorithm: degree-oriented wedge counting (the MapReduce-era
    standard for power-law graphs): each edge is directed from its
    lower-(degree, id) endpoint to the higher one, wedges are built
    only at each triangle's LOWEST-rank vertex, and closed against the
    canonical edge set. Why this matters at 100 TB: naive wedge
    enumeration at a hub vertex of degree d materializes d² candidate
    pairs — a single celebrity node in a social graph generates 10¹²
    wedges. Orientation caps every vertex's out-degree near √|E|, so
    the wedge stage is bounded by Σ out_deg(v)² ≈ |E|^1.5 — the same
    result set, orders of magnitude less shuffle. Every step is an
    equi-join (node or edge keys); nothing is ever collected.
    """
    a, b = F.col(a_col), F.col(b_col)
    deg = (
        edges.select(a.alias("node"))
        .unionAll(edges.select(b.alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # rank = (deg, node): a total order, so orientation is acyclic
    e = (
        edges.join(deg.withColumnRenamed("node", a_col), a_col)
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("node", b_col), b_col)
        .withColumnRenamed("deg", "deg_b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (a < b)),
                F.struct(a.alias("src"), b.alias("dst")),
            )
            .otherwise(F.struct(b.alias("src"), a.alias("dst")))
            .alias("o")
        )
        .select("o.src", "o.dst")
    )
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "u").where(F.col("v") < F.col("w"))
    closed = wedges.join(
        edges.select(
            F.col(a_col).alias("_ca"), F.col(b_col).alias("_cb")
        ),
        (F.least("v", "w") == F.col("_ca")) & (F.greatest("v", "w") == F.col("_cb")),
    ).select("u", "v", "w")
    nodes = (
        closed.select(F.col("u").alias("node"))
        .unionAll(closed.select(F.col("v").alias("node")))
        .unionAll(closed.select(F.col("w").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_distances(
    vertices: DataFrame,
    edges: DataFrame,
    seed: int,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Single-source BFS (hop distances) over an undirected edge list —
    the traversal primitive beside connected_components (labeling),
    pagerank_fixed (scoring) and triangle_counts (motifs): "how far is
    every record from this seed" powers blast-radius analysis of a
    contaminated document, link-distance features, and cluster
    diagnostics.

    Fixed `max_hops` rounds of distance relaxation: dist ← min(dist,
    min_neighbor(dist)+1), each round one equi-join on the edge key +
    one min-groupBy — never a cross product; lineage truncated per
    round (same localCheckpoint contract as connected_components).
    Deterministic by construction (min over exact ints, fixed round
    count). Returns (id, dist) for vertices within max_hops.
    """
    sym = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
    # materialize the edge list once: every relaxation round joins it,
    # and an expensive upstream (LSH candidate generation) would
    # otherwise re-run per round. Eager, like every checkpoint whose
    # blocks have multiple consumers in the next job (sym appears in
    # every relaxation level, and each level reads dist twice): lazy
    # checkpointing lets concurrent stages recompute the upstream in
    # duplicate before blocks land (r12 measurement on the CC variant).
    sym = sym.localCheckpoint(eager=True)
    dist = (
        vertices.select(F.col(vertices.columns[0]).alias("id"))
        .where(F.col("id") == seed)
        .select("id", F.lit(0).cast("bigint").alias("dist"))
    )
    for _ in range(max_hops):
        relaxed = (
            dist.join(sym, dist["id"] == sym["u"])
            .select(F.col("v").alias("id"), (F.col("dist") + 1).alias("dist"))
            .unionByName(dist)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        dist = relaxed.localCheckpoint(eager=True)
    return dist


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """(id, comp) via alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round algorithm that replaces label propagation when the
    graph can have long-diameter components (chains, lattices, social
    threads). Label propagation needs DIAMETER rounds; star operations
    square the shortcut length every alternation, so a 10⁶-node chain
    converges in ~20 rounds instead of 10⁶.

    One alternation:
      large-star: every node's strictly-LARGER neighbors re-attach to
                  the minimum of its closed neighborhood;
      small-star: every node and its ≤-neighbors attach to that
                  minimum (parent pointers collapse).
    Both are one groupBy-min + one join per pass — same shuffle shape
    as a propagation round, but exponentially fewer of them. The edge
    multiset converges to disjoint stars whose centers are the
    component minima; convergence is detected by an exact (count,
    hash-sum) edge-set signature, not a driver collect.

    Interface-identical to connected_components: comp = min reachable
    id, singleton nodes label themselves.
    """
    id_col = nodes.columns[0]
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # orient as (u, v) unordered pairs, deduped
    # eager=False: the signature() collect right below is the
    # materializing action — one job instead of two (and likewise one
    # job per alternation in the loop, guide §1.2).
    cur = (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def signature(frame):
        # bit_xor, not sum: summing 64-bit hashes overflows int64 under
        # ANSI mode; XOR is overflow-free and order-independent
        row = frame.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def star(frame, large: bool):
        sym = frame.select("u", "v").unionByName(
            frame.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        j = sym.join(m, "u")
        if large:
            out = j.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        else:
            out = (
                j.where(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("a"), F.col("m").alias("b"))
                .unionByName(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
            )
        return (
            out.where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
        )

    sig = signature(cur)
    for _ in range(max_iter):
        nxt = star(star(cur, large=True), large=False).localCheckpoint(eager=False)
        nsig = signature(nxt)
        cur.unpersist()
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"star components did not converge in {max_iter} alternations"
        )
    # converged: edges are (center, member) stars with center = min
    centers = cur.select(F.col("v").alias("id"), F.col("u").alias("comp"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .join(centers, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
