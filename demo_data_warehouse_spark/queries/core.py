"""Core relational operator queries (SURVEY §2.1-§2.8).

Each query cites the reference operator row it generalizes. Oracle SQL
is DuckDB dialect but kept as close to ANSI as possible.

Scale notes (100 TB posture):
  - only the *fixed-size* dims (nation, region) are explicitly
    broadcast; scaling tables (customer/orders/lineitem) are left to
    AQE so the plan survives a 1000× scale-up;
  - every filter/projection is expressed declaratively so Catalyst
    pushes it into the parquet scan (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from . import query

# ---------------------------------------------------------------------------
# helpers: exact accumulation → one final DOUBLE cast. All money/qty columns
# in the testdata are exactly 2-decimal, so both of these are lossless and
# order-independent — Spark's partial-aggregation order and DuckDB's serial
# order cannot change the value:
#
#   dsum  — DECIMAL accumulation. Unbounded-scale-safe (precision grows to
#           38), but Spark's sum buffer leaves the compact-long
#           representation once precision > 18, costing ~2× on the scan-agg
#           hot path (measured: TPC-H Q1 shape 1.17s → 0.55s at sf0.1).
#   csum  — fixed-point BIGINT accumulation (cents). Codegen-friendly
#           primitive long adds. Exact while the group sum fits int64:
#           2-dp inputs ≤ 10^7 cents/row hold to ~10^11 rows per group;
#           the 6-implied-dp charge product (~10^11/row) holds to ~10^7
#           rows per group ≈ sf50 on Q1's 6 groups. Queries pick csum when
#           the value range × plausible group cardinality clears int64 with
#           margin, else dsum — same decision a cost-based engine makes.


def dsum(col, alias=None):
    return F.sum(F.col(col).cast("decimal(14,2)")).cast("double").alias(alias or f"sum_{col}")


def dsum_expr(expr_col, alias):
    return F.sum(expr_col).cast("double").alias(alias)


def _sql_dsum(expr, alias, scale="DECIMAL(14,2)"):
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) AS {alias}"


def cents(col, dp=2):
    """Lossless fixed-point lift: 2-decimal double → integer cents."""
    return F.round(F.col(col) * (10**dp)).cast("bigint")


def csum(expr_col, alias, dp=2):
    """Exact bigint fixed-point sum reported as DOUBLE (see header)."""
    return (F.sum(expr_col).cast("double") / float(10**dp)).alias(alias)


def _sql_cents(expr, dp=2):
    return f"CAST(round(({expr}) * {10**dp}) AS BIGINT)"


def _sql_csum(cents_expr, alias, dp=2):
    return f"CAST(SUM({cents_expr}) AS DOUBLE) / {float(10 ** dp)} AS {alias}"


# ---------------------------------------------------------------------------
# §2.1 scans / §2.2 filters


@query(
    "scan_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def scan_filter(spark, sf_dir):
    """S2: warehouse read with predicate (reference dags/utils/etl.py:535-536).

    Filter + projection reach the parquet scan via Catalyst pushdown.
    """
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


@query(
    "project_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS linenumber_long,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_date,
           l_returnflag
    FROM lineitem
    """,
)
def project_cast(spark, sf_dir):
    """P1/P2/P4: schema-conforming projection + cast
    (reference dags/utils/common/schema_helper.py:18-49).

    FLOOR before the int cast: Spark truncates double→int, DuckDB
    rounds, so the cast itself is not portable — floor first is.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenumber_long"),
        F.floor("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        "l_returnflag",
    )


@query(
    "filter_notnull",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_orderkey IS NOT NULL
    """,
)
def filter_notnull(spark, sf_dir):
    """P5: not-null key filter (reference dags/utils/etl.py:154)."""
    return (
        table(spark, sf_dir, "lineitem")
        .na.drop(subset=["l_orderkey"])
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "filter_tscompare",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def filter_tscompare(spark, sf_dir):
    """P7: timestamp-compare predicate (reference dags/utils/etl.py:322-324)."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@query(
    "filter_watermark",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def filter_watermark(spark, sf_dir):
    """P8/ST2: high-watermark incremental predicate
    (reference dags/ingestion/lark_to_gcs.py:62)."""
    return (
        table(spark, sf_dir, "events")
        .where(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# §2.3 joins


@query(
    "join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_left(spark, sf_dir):
    """J1/J2/J4: fact ⟕ dim left equi-join (reference dags/utils/etl.py:437-438).

    customer scales with SF → no manual broadcast; AQE picks
    broadcast-hash at small SF and sort-merge at 100 TB.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_multihop",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           o.o_orderdate, c.c_custkey, c.c_nationkey, n.n_name
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey  = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    """,
)
def join_multihop(spark, sf_dir):
    """J3: multi-hop chained left joins (reference dags/utils/etl.py:511-514).

    nation is fixed-size (25 rows at any SF) → explicit broadcast;
    the scaling joins shuffle on their keys and AQE re-plans at runtime.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "o_orderdate",
            "c_custkey",
            "c_nationkey",
            "n_name",
        )
    )


@query(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """J5: left-anti join — SCD2 net-new key detection
    (reference dags/utils/etl.py:310-314)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_asof",
    oracle="""
    WITH r AS (
        SELECT o_custkey, o_orderdate,
               MAX(CAST(o_totalprice AS DECIMAL(14,2))) AS last_price
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           r.o_orderdate AS last_order_ts,
           CAST(r.last_price AS DOUBLE) AS last_price
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def join_asof(spark, sf_dir):
    """As-of join (point-in-time lookup): for each event, the newest
    order at or before it per user — the SCD2 "which version was
    current at event time" semantic as a first-class operator
    (operators/joins.py::asof_join: union + window carry-forward, one
    shuffle on the key, no range-join blowup)."""
    from ..operators.joins import asof_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    r = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("last_order_ts"))
        .agg(F.max(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("last_price"))
    )
    return asof_join(
        ev, r, key="user_id", left_ts="ts", right_ts="last_order_ts",
        right_cols=["last_order_ts", "last_price"],
    )


@query(
    "join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, s.s_name
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def join_salted(spark, sf_dir):
    """Skew-salted equi-join — result identical to the plain join, but
    hot keys shard across 8 reducers (operators/joins.py::salted_join);
    the static-planning form of AQE's skew-join split."""
    from ..operators.joins import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_suppkey")
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return salted_join(li, s, key="l_suppkey", salt_n=8)


@query(
    "join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi join — EXISTS, the complement of J5's anti-join: probe
    side never duplicates, build side never projects."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_agg_topk",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey LIMIT 10
    """,
)
def join_agg_topk(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on both fact sides pushed to the
    scans, 3-way join, grouped revenue, top-10 — the full pipeline
    Catalyst should run as filter-pushdown → shuffled joins → partial
    agg → TakeOrdered."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(csum(rev, "revenue", dp=4))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "join_inner_filtered",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, o.o_totalprice, c.c_acctbal
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < o.o_totalprice
    """,
)
def join_inner_filtered(spark, sf_dir):
    """J6: inner join + cross-side comparison predicate — SCD2
    changed-row detection (reference dags/utils/etl.py:320-325)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .where(F.col("c_acctbal") < F.col("o_totalprice"))
        .select("o_orderkey", "c_custkey", "o_totalprice", "c_acctbal")
    )


@query(
    "join_selflookup",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           COALESCE(m.n_name, r.r_name) AS parent_name
    FROM nation n
    LEFT JOIN nation m ON n.n_regionkey = m.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_selflookup(spark, sf_dir):
    """J8: broadcast-map lookup with first-match precedence — the
    leader_sur_id resolution (reference dags/utils/etl.py:302-305):
    probe two lookup maps, prefer the first, COALESCE the results."""
    n = table(spark, sf_dir, "nation")
    m = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("m_key"), F.col("n_name").alias("m_name")
    )
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(m), n.n_regionkey == m.m_key, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("m_name", "r_name").alias("parent_name"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 set ops


@query(
    "union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'open' AS slice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'done' AS slice FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_all(spark, sf_dir):
    """U1: unionByName assembling slices (reference dags/utils/etl.py:342-344)."""
    o = table(spark, sf_dir, "orders")
    a = o.where("o_orderstatus = 'O'").select("o_orderkey", "o_totalprice", F.lit("open").alias("slice"))
    b = o.where("o_orderstatus = 'F'").select("o_orderkey", "o_totalprice", F.lit("done").alias("slice"))
    return a.unionByName(b)


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def set_intersect(spark, sf_dir):
    """§2.7 generalization: INTERSECT (distinct) — customers active in
    both years. Plans as a distinct-aggregated hash semi-join."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def set_except(spark, sf_dir):
    """§2.7 generalization: EXCEPT (distinct) — churned customers; the
    set-algebra reading of the reference's left-anti (J5)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# ---------------------------------------------------------------------------
# §2.4 aggregations


@query(
    "agg_max",
    oracle="""
    SELECT MAX(o_orderdate) AS max_orderdate, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    """,
)
def agg_max(spark, sf_dir):
    """A1: column max → watermark calc (reference dags/ingestion/lark_to_gcs.py:65)."""
    return table(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("max_orderdate"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_base_price,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0
             AS sum_disc_price,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0
             AS sum_charge,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
             AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark, sf_dir):
    """A3 generalization: grouped sum/avg/count — TPC-H Q1 shape.

    Map-side partial aggregation + exact fixed-point bigint arithmetic
    (csum header note): 2-dp inputs lift losslessly to integer cents, so
    the sums are bit-identical under any accumulation order while the
    aggregate buffers stay primitive longs inside whole-stage codegen
    (~2× over DECIMAL accumulation, measured at sf0.1). The 6-implied-dp
    charge product is exact to ~10^7 rows per group (≈ sf50 here); past
    that the engine's dsum (DECIMAL) path is the drop-in fallback.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_p = price_c * (F.lit(100) - cents("l_discount"))
    charge = disc_p * (F.lit(100) + cents("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        csum(qty_c, "sum_qty"),
        csum(price_c, "sum_base_price"),
        csum(disc_p, "sum_disc_price", dp=4),
        csum(charge, "sum_charge", dp=6),
        (F.sum(qty_c).cast("double") / 100.0 / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark, sf_dir):
    """Distinct aggregation (declared generalization of A3, SURVEY §2.4)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY CUBE (month, event_type)
    """,
)
def agg_cube(spark, sf_dir):
    """A3: the 'cube' reading of cube_attendance_report
    (reference dags/utils/dwh/gold/cube_attendance_report.py:1-14)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    return ev.cube("month", "event_type").agg(
        csum(cents("value"), "sum_value"),
        F.count("*").alias("n"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY ROLLUP (month, event_type)
    """,
)
def agg_rollup(spark, sf_dir):
    """A3 generalization: hierarchical rollup (month → month+type → total)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    return ev.rollup("month", "event_type").agg(
        csum(cents("value"), "sum_value"),
        F.count("*").alias("n"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY GROUPING SETS ((month), (event_type))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """A3 generalization: explicit grouping sets — per-month and per-type
    marginals in one pass (Expand + single shuffle, no self-union)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    return ev.groupingSets([["month"], ["event_type"]], "month", "event_type").agg(
        csum(cents("value"), "sum_value"),
        F.count("*").alias("n"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           TRUE AS within_tolerance
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """Approx distinct (HyperLogLog++) — the 100 TB path for cardinality:
    one pass, fixed memory, no distinct shuffle (SURVEY §2.4/§4).

    Tolerance-twin oracle pattern (the sketch estimate isn't portable
    SQL): the SAME query also computes the exact cardinality and returns
    a deterministic ``within_tolerance`` boolean (all-integer ±5%
    comparison), so the driver hash-verifies both the exact values and
    that the HLL estimate landed inside its bound. The exact twin is the
    verification harness; production code would ship the approx column
    alone.

    Envelope sized from the sketch's OWN accuracy (the defect-class-#10
    lesson, SURVEY §6.1 margin table): rsd=0.01 makes the ±5% bound a
    5σ event per group (3 groups/run ⇒ expected excursions ~2e-6) —
    the original rsd=0.02 left it at 2.5σ, the exact wishful ratio
    that failed agg_sketch_rollup 5/31 days at 10× (defect #9)."""
    exact = F.count_distinct("o_custkey")
    approx = F.approx_count_distinct("o_custkey", rsd=0.01)
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            exact.alias("n_cust_exact"),
            F.count("*").alias("n_orders"),
            # all-integer: |approx-exact|*100 <= 5*exact OR |diff| <= 2
            (
                (F.abs(approx - exact) * 100 <= exact * 5)
                | (F.abs(approx - exact) <= 2)
            ).alias("within_tolerance"),
        )
    )


@query(
    "agg_approx_median",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) * 2
                AS BIGINT) AS p50_halfcents,
           TRUE AS p50_within_tolerance,
           TRUE AS p90_within_tolerance
    FROM events GROUP BY event_type
    """,
)
def agg_approx_median(spark, sf_dir):
    """Approx percentiles (Greenwald-Khanna sketch) — the 100 TB path for
    quantiles: one pass, fixed memory, mergeable partial sketches.

    Tolerance-twin oracle pattern: exact p50 crosses engines as an
    integer (half-cent units — 0.5-interpolation of bigints is an exact
    binary fraction in both engines), the sketch estimates stay
    Spark-side as deterministic ±2% booleans (exact p90's interpolated
    value carries float dirt at fraction 0.9, so only its verdict is
    returned). agg_median is the exact verification baseline (§2.5)."""
    ev = table(spark, sf_dir, "events")
    v_c = F.round(F.col("value") * 100).cast("bigint")
    p50_exact_hc = (F.expr("percentile(v_c, 0.5)") * 2).cast("bigint")
    p90_exact = F.expr("percentile(v_c, 0.9)")
    p50_approx = F.expr("approx_percentile(v_c, 0.5, 10000)")
    p90_approx = F.expr("approx_percentile(v_c, 0.9, 10000)")
    return (
        ev.select("event_type", v_c.alias("v_c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            p50_exact_hc.alias("p50_halfcents"),
            (
                F.abs(p50_approx * 2 - p50_exact_hc)
                <= F.greatest(p50_exact_hc * 0.02, F.lit(100.0))
            ).alias("p50_within_tolerance"),
            (
                F.abs(p90_approx - p90_exact)
                <= F.greatest(p90_exact * 0.02, F.lit(50.0))
            ).alias("p90_within_tolerance"),
        )
    )


@query(
    "agg_sliding",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS win_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT win_start,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM expanded GROUP BY win_start
    """,
)
def agg_sliding(spark, sf_dir):
    """Sliding event-time windows (1h window, 30m slide): every event
    lands in exactly two overlapping windows. Spark expands this
    natively (window() with slideDuration); the oracle enumerates the
    two containing windows per event explicitly."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            csum(cents("value"), "sum_value"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("win_start"), "sum_value", "n")
    )


@query(
    "fn_numeric_coerce",
    oracle="""
    SELECT event_id,
           COALESCE(
               TRY_CAST(
                   CASE WHEN event_id % 3 = 0 THEN CAST(value AS VARCHAR)
                        WHEN event_id % 3 = 1 THEN '[' || CAST(event_id AS VARCHAR) || ']'
                        ELSE 'n/a' END
                   AS DOUBLE),
               TRY_CAST(json_extract_string(
                   CASE WHEN event_id % 3 = 1
                        THEN '[' || CAST(event_id AS VARCHAR) || ']' END, '$[0]')
                   AS DOUBLE),
               0.0) AS coerced
    FROM events
    """,
)
def fn_numeric_coerce(spark, sf_dir):
    """F7: defensive numeric coercion — plain number || list-repr head
    || 0 (reference dags/utils/common/data_helper.py:109-122), as a
    JVM-native try_cast/coalesce chain instead of a row-wise literal_eval."""
    ev = table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.col("value").cast("string"))
        .when(F.col("event_id") % 3 == 1, F.concat(F.lit("["), F.col("event_id").cast("string"), F.lit("]")))
        .otherwise(F.lit("n/a"))
    )
    listy = F.when(
        F.col("event_id") % 3 == 1,
        F.concat(F.lit("["), F.col("event_id").cast("string"), F.lit("]")),
    )
    return ev.select(
        "event_id",
        F.coalesce(
            raw.try_cast("double"),
            F.get_json_object(listy, "$[0]").try_cast("double"),
            F.lit(0.0),
        ).alias("coerced"),
    )


@query(
    "agg_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def agg_tumbling(spark, sf_dir):
    """ST extension: tumbling event-time window aggregation (batch form;
    the streaming form with watermark lives in streaming/pipeline.py)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            csum(cents("value"), "sum_value"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "sum_value", "n")
    )


# ---------------------------------------------------------------------------
# §2.5 windows


@query(
    "window_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def window_latest(spark, sf_dir):
    """W1/A2: latest-per-key — the SCD2 'is_current' semantic recomputed
    as a window (reference dags/utils/etl.py:298-301)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "window_running",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
           AS running_value
    FROM events
    """,
)
def window_running(spark, sf_dir):
    """W2: running total per key (SURVEY §2.5 generalization).
    Fixed-point bigint accumulation (csum header note) keeps the running
    frame exact and primitive-typed."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(cents("value")).over(w).cast("double") / 100.0).alias("running_value"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
           epoch_us(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS gap_us
    FROM events
    """,
)
def window_lag_lead(spark, sf_dir):
    """W generalization: lag/lead neighbors per key — the inter-event
    gap that feeds sessionization (agg_session) and SCD2 valid_from/
    valid_to chaining."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        prev.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        # exact integer microseconds — a float division here drifts in
        # the last ulp vs any other engine's interval arithmetic
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
    )


@query(
    "window_sessionize",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN epoch_us(ts - lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM g
    """,
)
def window_sessionize(spark, sf_dir):
    """Sessionization with session IDs assigned back to EVENTS (the
    row-level complement of agg_session's per-session rollup): a new
    session starts after a >30-min gap; session_id is the running count
    of gap breaks per user. Both window functions share one
    (user_id)-partitioned spec — a single shuffle, no self-join. The
    exact-µs gap keeps the break flag engine-portable."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flag = F.when(gap_us > 1800000000, 1).otherwise(0)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.sum(flag)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS purchase
    FROM events GROUP BY strftime(ts, '%Y-%m')
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot (wide report): per-month columns per event type. Explicit
    pivot values keep it a single-pass agg — without them Spark needs an
    extra distinct scan to discover the columns."""
    ev = table(spark, sf_dir, "events").withColumn("month", F.date_format("ts", "yyyy-MM"))
    return (
        ev.groupBy("month")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg((F.sum(cents("value")).cast("double") / 100.0))
    )


@query(
    "agg_median",
    oracle="""
    SELECT event_type,
           ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS median_value,
           ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90_value
    FROM events GROUP BY event_type
    """,
)
def agg_median(spark, sf_dir):
    """Exact percentiles (continuous interpolation) per group; rounded
    to 4dp so the two engines' interpolation arithmetic can't drift.
    The 100 TB path is approx_percentile (one pass, fixed memory) —
    exact percentile is the verification baseline."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_value"),
    )


@query(
    "agg_conditional_ratio",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%%'
                    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
           * 100.0 AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def agg_conditional_ratio(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share) over lineitem ⋈ part — LIKE predicate + CASE inside an exact
    fixed-point sum; the 10^4 scale factor cancels in the ratio, taken
    once at double precision."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    disc = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(disc).cast("double") * 100.0).alias(
                "promo_pct"
            ),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit


@query(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def orderby_limit(spark, sf_dir):
    """Top-k: Spark plans TakeOrderedAndProject — no full sort at scale."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.8 scalar functions


@query(
    "fn_md5",
    oracle="""
    SELECT c_custkey,
           md5(concat(c_name, CAST(c_custkey AS VARCHAR))) AS sur_id
    FROM customer
    """,
)
def fn_md5(spark, sf_dir):
    """F1: md5 surrogate key (reference dags/utils/etl.py:282-284) —
    JVM-native F.md5, no Python UDF."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(F.concat(F.col("c_name"), F.col("c_custkey").cast("string"))).alias("sur_id"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def fn_json_extract(spark, sf_dir):
    """F2/F3: nested-cell field extraction — JSON path, JVM-native
    (reference dags/utils/etl.py:285-296)."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "fn_element_at",
    oracle="SELECT vec_id, embedding[1] AS first_dim FROM embeddings",
)
def fn_element_at(spark, sf_dir):
    """F5: list-head coercion (reference dags/utils/etl.py:496-499)."""
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.element_at("embedding", 1).alias("first_dim")
    )


@query(
    "fn_ts_millis",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ts_ms, epoch_ms(epoch_ms(ts)) AS ts_roundtrip
    FROM events
    """,
)
def fn_ts_millis(spark, sf_dir):
    """F6: epoch-millis ↔ timestamp (reference dags/utils/common/data_helper.py:132-137)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_roundtrip"),
    )


@query(
    "fn_datefmt",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts_str
    FROM orders
    """,
)
def fn_datefmt(spark, sf_dir):
    """F9/F10: month bucket + formatted timestamp string
    (reference dags/utils/etl.py:632-633)."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts_str"),
    )


@query(
    "fn_tz_shift",
    oracle="SELECT event_id, ts + INTERVAL 7 HOUR AS ts_ict FROM events",
)
def fn_tz_shift(spark, sf_dir):
    """F12: explicit +7h UTC→Asia/Ho_Chi_Minh shift
    (reference dags/utils/etl.py:631,640-647)."""
    return table(spark, sf_dir, "events").select(
        "event_id", (F.col("ts") + F.expr("INTERVAL 7 HOURS")).alias("ts_ict")
    )


@query(
    "fn_try_ts",
    oracle="""
    SELECT event_id,
           try_strptime(
               CASE WHEN event_id % 10 = 0 THEN 'not-a-date'
                    ELSE strftime(ts, '%d/%m/%Y %H:%M') END,
               '%d/%m/%Y %H:%M') AS parsed_ts
    FROM events
    """,
)
def fn_try_ts(spark, sf_dir):
    """F11: lenient datetime parse, errors→null
    (reference dags/utils/etl.py:637-639). Spark 4 to_timestamp throws;
    try_to_timestamp is the pandas errors='coerce' analog."""
    ev = table(spark, sf_dir, "events")
    s = F.when(F.col("event_id") % 10 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("ts", "dd/MM/yyyy HH:mm")
    )
    return ev.select(
        "event_id",
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy HH:mm")).alias("parsed_ts"),
    )


@query(
    "fn_clip_metric",
    oracle="""
    SELECT event_id,
           abs(least((value - 50.0) / 60.0, 0.0)) AS late_minute,
           (value - 50.0) / 3600.0 AS duration_hour
    FROM events
    """,
)
def fn_clip_metric(spark, sf_dir):
    """F13-F15: the clip(upper=0).abs() late/early metric quirk and the
    /3600 duration (reference dags/utils/etl.py:640-653), on events.value."""
    ev = table(spark, sf_dir, "events")
    diff = (F.col("value") - F.lit(50.0)) / F.lit(60.0)
    return ev.select(
        "event_id",
        F.abs(F.least(diff, F.lit(0.0))).alias("late_minute"),
        ((F.col("value") - F.lit(50.0)) / F.lit(3600.0)).alias("duration_hour"),
    )


@query(
    "fn_fillna",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN event_type = 'click' THEN value END, 0.0) AS value_filled,
           COALESCE(CASE WHEN event_type = 'click' THEN TRUE END, FALSE) AS is_click
    FROM events
    """,
)
def fn_fillna(spark, sf_dir):
    """F8: null defaults — bool→False, numeric→0
    (reference dags/utils/common/data_helper.py:139-145)."""
    ev = table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "click", F.col("value"))
    b = F.when(F.col("event_type") == "click", F.lit(True))
    return ev.select(
        "event_id",
        F.coalesce(v, F.lit(0.0)).alias("value_filled"),
        F.coalesce(b, F.lit(False)).alias("is_click"),
    )


# ---------------------------------------------------------------------------
# flagship: the gold attendance-report shape on TPC-H data
# (J1 join → F9 month bucket → A3 monthly group agg with derived metrics)


@query(
    "flagship_report",
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
           c.c_mktsegment,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_totalprice,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_totalprice,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY strftime(o.o_orderdate, '%Y-%m'), c.c_mktsegment
    """,
)
def flagship_report(spark, sf_dir):
    """Flagship (SURVEY §7.1 step 3): gold cube_attendance_report shape —
    fact ⟕ dim (J4), month bucket (F9), grouped report (A3) —
    on orders ⟕ customer (reference dags/utils/etl.py:616-677)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    sum_d = F.sum(cents("o_totalprice")).cast("double") / 100.0
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("order_month", "c_mktsegment")
        .agg(
            sum_d.alias("sum_totalprice"),
            (sum_d / F.count("*")).alias("avg_totalprice"),
            F.count("*").alias("n_orders"),
        )
    )
