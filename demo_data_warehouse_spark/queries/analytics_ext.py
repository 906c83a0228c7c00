"""Round-7 analytics extensions: skyline, sketch frequency, A/B stats,
spatial grid join, exact decision stump, k-anonymity audit.

Each operator follows the house exactness rules (queries/__init__.py):
integer/fixed-point hot paths, portable md5-60 hashes where the oracle
must replay bucketing, and — where a scalar statistic is genuinely
real-valued (chi-square, stump gain) — a DOUBLE computed by the
IDENTICAL expression over exact int64 inputs on both engines, so IEEE
754 determinism makes the values bit-equal.

Reference semantics ancestry: these generalize the reference's
pandas report layer (dags/utils/etl.py gold transforms — group/agg/
rank) into the analytics a warehouse user runs on the same tables;
none exist verbatim in the reference (it has no analytics beyond
groupby reports), they are the declared §2.10f extension set.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.dedup import hash60_sql
from . import query

_DUCK_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


# --------------------------------------------------------------------------
# S109: skyline (Pareto frontier)
# --------------------------------------------------------------------------

def pareto_frontier(df, minimize: str, maximize: str, *extra_partition):
    """Rows not strictly dominated on (minimize ↓, maximize ↑), computed
    O(n log n) per partition group: sort by `minimize`; a row survives
    iff no strictly-smaller row reaches its `maximize` (RANGE-frame
    running max) and no equal-`minimize` row exceeds it. Equal pairs
    (ties on both axes) all survive — strict dominance. Passing a salt
    column in extra_partition gives the safe local-prune phase: a row
    dominated inside its own salt is dominated globally.
    """
    cheaper = (
        Window.partitionBy(*extra_partition)
        .orderBy(minimize)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same = Window.partitionBy(*extra_partition, minimize)
    return (
        df.withColumn("_dom_lt", F.max(maximize).over(cheaper))
        .withColumn("_dom_eq", F.max(maximize).over(same))
        .where(
            (F.col("_dom_lt").isNull() | (F.col("_dom_lt") < F.col(maximize)))
            & (F.col("_dom_eq") <= F.col(maximize))
        )
        .drop("_dom_lt", "_dom_eq")
    )


def frontier_survivor_guard(df, limit: int, what: str = "pareto phase-2"):
    """Loud upper bound on a frontier survivor set before an
    unpartitioned exact pass. Phase 1's salted prune bounds survivors
    in any realistic distribution (a point dominated within its salt is
    dominated globally), but an adversarial all-on-the-frontier input —
    both axes monotone — keeps EVERY row, and phase 2 would sort n rows
    on one partition. This is an UPPER-bound guard on adversarial data,
    deliberately not a lower bound (a lower bound is the scale-coupled
    in-query-assert failure mode join_auto_salt had): small inputs pass
    trivially, and at scale the degenerate case raises instead of
    silently serializing. Costs one extra pass over the (pruned,
    dim-sized) survivor plan."""
    n = df.count()
    if n > limit:
        raise RuntimeError(
            f"{what}: {n} frontier survivors exceed the single-partition "
            f"bound {limit}; the input is adversarially monotone — raise the "
            "salt fan-out or refine with a distributed skyline pass"
        )
    return df


@query(
    "window_skyline",
    oracle="""
    WITH p AS (
      SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
             p_size
      FROM part)
    SELECT a.p_partkey, a.cents, a.p_size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.cents <= a.cents AND b.p_size >= a.p_size
        AND (b.cents < a.cents OR b.p_size > a.p_size))
    """,
)
def window_skyline(spark, sf_dir):
    """Pareto frontier (skyline): parts no other part strictly
    dominates on (cheaper price, larger size). Two-phase, skew-proof:
    phase 1 prunes per (salt) — a point dominated inside its own salt
    is dominated globally, so dropping it is always safe and the 32
    local passes are bounded parallel sorts; phase 2 runs the exact
    frontier test on the (tiny) survivor set. The frontier test itself
    is O(n log n), not O(n²): sort by price, then a point survives iff
    no strictly-cheaper row has size >= its own (RANGE frame running
    max) and no same-price row has size > its own — together exactly
    the NOT EXISTS dominance the oracle states independently.
    """
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        "p_size",
    )
    local = pareto_frontier(
        p.withColumn("salt", F.pmod(F.xxhash64("p_partkey"), F.lit(32))),
        "cents", "p_size", "salt",
    ).drop("salt")
    local = frontier_survivor_guard(local, 100_000, "window_skyline phase-2")
    return pareto_frontier(local, "cents", "p_size").select(
        "p_partkey", "cents", "p_size"
    )


# --------------------------------------------------------------------------
# S110: count-min sketch rollup
# --------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 1024


def _cms_cell_spark(item: str, j: str) -> str:
    return f"pmod({hash60_sql(f'concat({item}, chr(35), {j})')}, {_CMS_WIDTH})"


@query(
    "agg_cms_rollup",
    oracle=f"""
    WITH rows_j AS (
      SELECT event_type,
             j.j AS j,
             {_DUCK_H60.format(x="concat(event_type, chr(35), CAST(j.j AS VARCHAR))")}
               % {_CMS_WIDTH} AS cell
      FROM events
      CROSS JOIN (VALUES (0), (1), (2)) AS j(j)),
    cells AS (
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM rows_j GROUP BY j, cell),
    items AS (
      SELECT DISTINCT event_type,
             j.j AS j,
             {_DUCK_H60.format(x="concat(event_type, chr(35), CAST(j.j AS VARCHAR))")}
               % {_CMS_WIDTH} AS cell
      FROM events
      CROSS JOIN (VALUES (0), (1), (2)) AS j(j))
    SELECT i.event_type AS item, MIN(c.cnt) AS est_cnt
    FROM items i JOIN cells c ON i.j = c.j AND i.cell = c.cell
    GROUP BY i.event_type
    """,
)
def agg_cms_rollup(spark, sf_dir):
    """Count-min sketch as a mergeable frequency rollup: per-DAY
    (depth × width) bucket-count partials, summed into the period
    sketch without re-reading facts — point-lookup frequency for a
    domain too wide to census (the CM answer to agg_topk_rollup's
    heavy-hitters). State is depth·width cells per day regardless of
    cardinality; merge is elementwise +. Estimate(item) = min over
    rows of its bucket counts. Portable md5-60 bucketing lets the
    oracle replay the exact cells, so the comparison is bit-for-bit
    even where buckets collide (the oracle computes the same biased
    estimate, not the true count — the sketch contract itself).
    """
    ev = table(spark, sf_dir, "events")
    js = F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("j")
    rows_j = ev.select(
        "event_type", F.to_date("ts").alias("day"), js
    ).withColumn(
        "cell", F.expr(_cms_cell_spark("event_type", "cast(j as string)"))
    )
    per_day = rows_j.groupBy("day", "j", "cell").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    merged = per_day.groupBy("j", "cell").agg(F.sum("cnt").alias("cnt"))
    items = (
        ev.select("event_type").distinct()
        .select("event_type", js)
        .withColumn(
            "cell", F.expr(_cms_cell_spark("event_type", "cast(j as string)"))
        )
    )
    return (
        items.join(F.broadcast(merged), ["j", "cell"])
        .groupBy(F.col("event_type").alias("item"))
        .agg(F.min("cnt").alias("est_cnt"))
    )


# --------------------------------------------------------------------------
# S111: chi-square A/B test
# --------------------------------------------------------------------------

# one formula string, spelled once, pasted into BOTH engines: exact
# int64 counts cast to DOUBLE, then a fixed parse tree of IEEE 754
# ops — deterministic on any conforming engine, so the DOUBLE hashes.
_CHI2 = (
    "((CAST(a AS DOUBLE) + b + c + d) * "
    "((CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c) * "
    "(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c))) / "
    "(((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)) * "
    "((CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)))"
)


@query(
    "agg_chisq_abtest",
    oracle=f"""
    WITH assigned AS (
      SELECT {_DUCK_H60.format(x="concat(CAST(user_id AS VARCHAR), 'v')")} % 2
               AS variant,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS success
      FROM events),
    cm AS (
      SELECT
        CAST(SUM(CASE WHEN variant = 0 AND success = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN variant = 0 AND success = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN variant = 1 AND success = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN variant = 1 AND success = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM assigned)
    SELECT a, b, c, d, {_CHI2} AS chi2
    FROM cm
    """,
)
def agg_chisq_abtest(spark, sf_dir):
    """Two-proportion chi-square for an A/B experiment: variant
    assignment is the portable hash of user_id (the deterministic
    bucketing an experimentation platform uses — sticky, uniform, no
    assignment table), success = purchase. The 2×2 contingency counts
    are exact int64 from one map-side-combined aggregation (4-value
    state at any scale); the statistic N(ad-bc)²/((a+b)(c+d)(a+c)(b+d))
    is evaluated by the same expression text on both engines over those
    exact counts, so the DOUBLE is bit-reproducible (intermediates
    ~1e23 would overflow int64 — DOUBLE is the honest type here).
    """
    ev = table(spark, sf_dir, "events")
    assigned = ev.select(
        F.expr(
            f"pmod({hash60_sql('concat(cast(user_id as string), chr(118))')}, 2)"
        ).alias("variant"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("success"),
    )
    cm = assigned.agg(
        F.sum(F.when((F.col("variant") == 0) & (F.col("success") == 1), 1).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("success") == 0), 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("success") == 1), 1).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("success") == 0), 1).otherwise(0))
        .cast("bigint").alias("d"),
    )
    return cm.select("a", "b", "c", "d", F.expr(_CHI2).alias("chi2"))


# --------------------------------------------------------------------------
# S112: spatial grid-bucketed nearest join
# --------------------------------------------------------------------------

_CELL = 5_000_000  # 5 degrees in micro-degrees


def _coord_spark(key: str, axis: str, span: int) -> str:
    return f"pmod({hash60_sql(f'concat(cast({key} as string), {axis!r})')}, {span})"


def _coord_duck(key: str, axis: str, span: int) -> str:
    h = _DUCK_H60.format(x=f"concat(CAST({key} AS VARCHAR), '{axis}')")
    return f"{h} % {span}"


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey,
             {_coord_duck("c_custkey", "lat", 90_000_000)} AS lat,
             {_coord_duck("c_custkey", "lon", 180_000_000)} AS lon
      FROM customer),
    supp AS (
      SELECT s_suppkey,
             {_coord_duck("s_suppkey", "lat", 90_000_000)} AS lat,
             {_coord_duck("s_suppkey", "lon", 180_000_000)} AS lon
      FROM supplier),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
               + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
      FROM cust c
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(dlat)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(dlon)
      JOIN supp s
        ON s.lat // {_CELL} = c.lat // {_CELL} + dx.dlat
       AND s.lon // {_CELL} = c.lon // {_CELL} + dy.dlon),
    ranked AS (
      SELECT c_custkey, s_suppkey, dist2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist2, s_suppkey) AS rn
      FROM cand
      WHERE dist2 <= CAST({_CELL} AS BIGINT) * {_CELL})
    SELECT c_custkey, s_suppkey, dist2 FROM ranked WHERE rn = 1
    """,
)
def join_spatial_grid(spark, sf_dir):
    """Nearest-supplier spatial join via grid bucketing — the 2-D
    range join Spark has no native operator for, reduced to an
    EQUI-join: both sides are keyed to ⌊coord/cell⌋ grid cells, each
    probe point expands to its 3×3 neighborhood (constant ×9 fan-out,
    never |L|×|R|), candidates beyond one cell radius are filtered,
    and argmin(dist², key) picks the match. At 100 TB the cell key is
    the shuffle/partition key (or the small side broadcasts, as here);
    the same shape serves geo nearest-facility, pickup-matching, and
    collision joins. Coordinates are derived micro-degree ints from
    the portable hash (testdata has no geo columns) — the operator
    under test is the bucketing, which the oracle replays exactly;
    distances are flat-grid integer µdeg² (haversine is a formula
    swap at the same join shape). Customers with an empty neighborhood
    are absent (inner semantics), exactly as in the oracle.
    """
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_coord_spark("c_custkey", "lat", 90_000_000)).alias("lat"),
        F.expr(_coord_spark("c_custkey", "lon", 180_000_000)).alias("lon"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_coord_spark("s_suppkey", "lat", 90_000_000)).alias("lat"),
        F.expr(_coord_spark("s_suppkey", "lon", 180_000_000)).alias("lon"),
    ).withColumn("s_clat", F.expr(f"lat div {_CELL}")).withColumn(
        "s_clon", F.expr(f"lon div {_CELL}")
    )
    probes = (
        cust.withColumn("dlat", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dlon", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("s_clat", F.expr(f"lat div {_CELL}") + F.col("dlat"))
        .withColumn("s_clon", F.expr(f"lon div {_CELL}") + F.col("dlon"))
    )
    cand = probes.join(
        F.broadcast(supp.withColumnRenamed("lat", "slat").withColumnRenamed("lon", "slon")),
        ["s_clat", "s_clon"],
    ).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat"))
            + (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon"))
        ).alias("dist2"),
    ).where(F.col("dist2") <= F.lit(_CELL).cast("bigint") * F.lit(_CELL))
    w = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist2")
    )


# --------------------------------------------------------------------------
# S113: exact decision stump
# --------------------------------------------------------------------------

# gain surrogate: maximizing S_L²/n_L + S_R²/n_R minimizes split SSE
# (Σq² is constant). Same single-expression DOUBLE trick as _CHI2.
_GAIN = (
    "(CAST(s_l AS DOUBLE) * s_l) / n_l + (CAST(s_r AS DOUBLE) * s_r) / n_r"
)


@query(
    "ml_decision_stump",
    oracle=f"""
    WITH census AS (
      SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS s
      FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(n) AS n_t, SUM(s) AS s_t FROM census),
    splits AS (
      SELECT disc_pct AS split_at,
             CAST(SUM(n) OVER w AS BIGINT) AS n_l,
             CAST(SUM(s) OVER w AS BIGINT) AS s_l,
             CAST(t.n_t - SUM(n) OVER w AS BIGINT) AS n_r,
             CAST(t.s_t - SUM(s) OVER w AS BIGINT) AS s_r
      FROM census CROSS JOIN tot t
      WINDOW w AS (ORDER BY disc_pct
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    scored AS (
      SELECT split_at, n_l, s_l, n_r, s_r, {_GAIN} AS gain,
             ROW_NUMBER() OVER (ORDER BY {_GAIN} DESC, split_at) AS rn
      FROM splits WHERE n_r > 0)
    SELECT split_at, n_l, s_l, n_r, s_r, gain FROM scored WHERE rn = 1
    """,
)
def ml_decision_stump(spark, sf_dir):
    """Exact regression decision stump: the best threshold on
    l_discount predicting l_quantity by SSE reduction. The full scan
    collapses to an 11-row census (n, Σq per distinct feature value)
    via one map-side-combined aggregation — int64-exact because the
    target is a small integer (Σq ≤ 5·10⁷ even at sf100); left/right
    split stats come from a running sum over the census (11 rows, not
    the fact table), and the gain S_L²/n_L + S_R²/n_R — the
    variance-reduction argmax with the constant Σq² dropped — is the
    same DOUBLE expression on both engines over exact ints, so the
    chosen split AND its score hash bit-for-bit. Ties break to the
    smallest threshold. This is one boosting/tree-building iteration
    expressed as a census + window — the shape a distributed GBM
    inner loop wants at 100 TB (shuffle is |distinct values|, never
    rows).
    """
    li = table(spark, sf_dir, "lineitem")
    census = li.groupBy(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round("l_quantity").cast("bigint")).cast("bigint").alias("s"),
    )
    w = Window.orderBy("disc_pct").rowsBetween(Window.unboundedPreceding, 0)
    tot = census.agg(
        F.sum("n").alias("n_t"), F.sum("s").alias("s_t")
    )
    splits = (
        census.crossJoin(F.broadcast(tot))
        .select(
            F.col("disc_pct").alias("split_at"),
            F.sum("n").over(w).cast("bigint").alias("n_l"),
            F.sum("s").over(w).cast("bigint").alias("s_l"),
            (F.col("n_t") - F.sum("n").over(w)).cast("bigint").alias("n_r"),
            (F.col("s_t") - F.sum("s").over(w)).cast("bigint").alias("s_r"),
        )
        .where(F.col("n_r") > 0)
    )
    scored = splits.select(
        "*", F.expr(_GAIN).alias("gain")
    ).withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("gain").desc(), "split_at")),
    )
    return scored.where(F.col("rn") == 1).select(
        "split_at", "n_l", "s_l", "n_r", "s_r", "gain"
    )


# --------------------------------------------------------------------------
# S114: k-anonymity audit
# --------------------------------------------------------------------------

_K_ANON = 10


@query(
    "dq_k_anonymity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) < {_K_ANON}
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (nation, market
    segment): equivalence classes smaller than k are re-identification
    risks that must be suppressed or generalized before a dataset is
    released (the governance gate in front of fn_column_mask's
    masking and fn_governed_view's row filters). One
    map-side-combined groupBy — |QI-domain| state, never rows — and
    the HAVING filter returns exactly the risky classes.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("n"))
        .where(F.col("n") < _K_ANON)
    )
