"""TPC-H completion family — the classic decision-support shapes not yet
in the registry (SURVEY §2.3/§2.4 generalizations, part 3).

The reference's analytical surface is a grouped attendance report
(dags/utils/dwh/gold/attendance_report.py); rounds 1-3 generalized it to
Q1/Q3/Q5/Q7/Q14/Q18 shapes. This module completes the canonical TPC-H
decision-support sweep with the remaining distinct optimizer shapes:
outer-join count distribution (Q13), correlated-average threshold (Q17),
disjunctive OR-of-ANDs pushdown (Q19), anti-join + scalar average (Q22),
global-fraction HAVING (Q11), max-over-aggregated-view (Q15),
returned-item top-k (Q10), multi-dim profit rollup (Q9), market-share
conditional ratio (Q8), and the multi-party EXISTS/NOT-EXISTS chain
(Q21). Each is adapted to the testdata's columns (no partsupp /
commitdate / receiptdate in the synthetic schema).

Exactness: every money/qty aggregate goes through the fixed-point bigint
lift (core.cents/csum) and every threshold comparison is cross-multiplied
to integers (qty < 0.2*avg becomes qty*5*cnt < sum), so Spark's partial
aggregation order and DuckDB's serial order cannot flip a boundary row.

Scale notes (100 TB posture):
  - Q13: the left join shuffles fact and dim once on custkey; the first
    aggregate reuses that partitioning (no second shuffle); the
    distribution aggregate moves one row per distinct count.
  - Q17/Q11/Q15: self-aggregate then re-join — the aggregate side is
    keyed identically to the probe side, so AQE plans a co-partitioned
    join; the global-total sides are one-row broadcasts.
  - Q19: the OR-of-ANDs predicate references only scan columns, so
    Catalyst pushes the common conjuncts (p_size/p_brand bounds) into
    the parquet scan and evaluates the residual disjunction before the
    join build side is materialized.
  - Q21: one shuffle on orderkey computes per-order max-shipdate and
    supplier multiplicity together; no correlated per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from . import query
from .core import _sql_cents, _sql_csum, cents, csum

# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join, double aggregate)


@query(
    "join_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def join_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders.
    The LEFT join keeps order-less customers (COUNT over a NULL column
    yields 0); the inner aggregate reuses the join's custkey
    partitioning, and the outer aggregate reduces to one row per
    distinct order count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue vs per-part average (correlated threshold)


@query(
    "subquery_avg_threshold",
    oracle=f"""
    WITH s AS (
      SELECT l_partkey,
             SUM({_sql_cents("l_quantity")}) AS sum_qty_c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           {_sql_csum(_sql_cents("l.l_extendedprice"), "small_rev")},
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN s ON s.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_sql_cents("l.l_quantity")} * 5 * s.cnt < s.sum_qty_c
    GROUP BY p.p_brand
    """,
)
def subquery_avg_threshold(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average quantity, per brand. The correlated
    average is a self-aggregate re-joined on partkey (same key → AQE
    co-partitions both sides); `qty < 0.2*avg` is cross-multiplied to
    `qty_c*5*cnt < sum_qty_c` so the boundary is integer-exact."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    stats = li.groupBy("l_partkey").agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(stats, "l_partkey")
        .where(cents("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty_c"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            csum(cents("l_extendedprice"), "small_rev"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive OR-of-ANDs predicate over a join


@query(
    "filter_disjunctive",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {_sql_csum(
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})",
               "revenue", dp=4)}
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_type = 'ECONOMY' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def filter_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: an OR of AND-groups mixing columns from both
    join sides. Catalyst splits the disjunction: part-only conjunct
    bounds (size/brand/type) push into the part scan, lineitem-only
    quantity bounds into the lineitem scan, and the residual OR runs
    post-join — the scans never read rows no disjunct could accept."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25) & qty.between(10, 30))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 40) & qty.between(20, 50))
    )
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(pred)
        .agg(F.count("*").alias("n_lines"), csum(rev, "revenue", dp=4))
    )


# ---------------------------------------------------------------------------
# Q22 — above-segment-average customers with no orders (anti + scalar avg)


@query(
    "subquery_anti_scalar",
    oracle=f"""
    WITH seg AS (
      SELECT c_mktsegment,
             SUM({_sql_cents("c_acctbal")}) AS sum_bal_c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer WHERE c_acctbal > 0.0
      GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {_sql_csum(_sql_cents("c.c_acctbal"), "totacctbal")}
    FROM customer c
    JOIN seg ON seg.c_mktsegment = c.c_mktsegment
    WHERE {_sql_cents("c.c_acctbal")} * seg.cnt > seg.sum_bal_c
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def subquery_anti_scalar(spark, sf_dir):
    """TPC-H Q22 shape: per market segment, count the customers whose
    balance beats the segment average (over positive balances) yet who
    have gone inactive — no order since 2001-01-01. (Classic Q22 tests
    'never ordered'; the synthetic data gives every customer at least
    one order, so the dormancy cutoff keeps the anti-join branch
    non-vacuous.) The segment average is a tiny broadcast; the recency
    check is a left-anti join against the date-filtered orders scan —
    `bal > avg` cross-multiplied to `bal_c * cnt > sum_c` for an exact
    boundary."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    seg = (
        c.where(F.col("c_acctbal") > 0.0)
        .groupBy("c_mktsegment")
        .agg(F.sum(cents("c_acctbal")).alias("sum_bal_c"), F.count("*").alias("cnt"))
    )
    rich = (
        c.join(F.broadcast(seg), "c_mktsegment")
        .where(cents("c_acctbal") * F.col("cnt") > F.col("sum_bal_c"))
    )
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), csum(cents("c_acctbal"), "totacctbal"))
    )


# ---------------------------------------------------------------------------
# Q11 — groups exceeding a fixed fraction of the global total


@query(
    "agg_global_fraction",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_partkey,
             SUM({_sql_cents("l_extendedprice")}
                 * (100 - {_sql_cents("l_discount")})) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ), total AS (SELECT SUM(rev_c) AS total_c FROM part_rev)
    SELECT l_partkey,
           CAST(rev_c AS DOUBLE) / 10000.0 AS part_rev
    FROM part_rev, total
    WHERE CAST(rev_c AS DECIMAL(38,0)) * 2000 > CAST(total_c AS DECIMAL(38,0))
    """,
)
def agg_global_fraction(spark, sf_dir):
    """TPC-H Q11 shape: parts whose discounted revenue exceeds 1/2000 of
    the global total. The per-part aggregate is one shuffle; the global
    total re-aggregates those partials to one row and broadcasts; the
    fraction test is `rev*2000 > total` in DECIMAL(38,0) so it stays
    exact past the int64 range (at 100 TB the global total alone
    overflows bigint cents — the comparison must widen, the per-group
    sums need not)."""
    li = table(spark, sf_dir, "lineitem")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    part_rev = li.groupBy("l_partkey").agg(F.sum(rev).alias("rev_c"))
    total = part_rev.agg(F.sum("rev_c").alias("total_c"))
    return (
        part_rev.join(F.broadcast(total))
        .where(
            F.col("rev_c").cast("decimal(38,0)") * 2000
            > F.col("total_c").cast("decimal(38,0)")
        )
        .select(
            "l_partkey",
            (F.col("rev_c").cast("double") / 10000.0).alias("part_rev"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — supplier(s) with maximum revenue over a window (view + max scalar)


@query(
    "join_revenue_view_max",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey,
             SUM({_sql_cents("l_extendedprice")}
                 * (100 - {_sql_cents("l_discount")})) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey
    ), mx AS (SELECT MAX(rev_c) AS max_c FROM srev)
    SELECT s.s_suppkey, s.s_name,
           CAST(srev.rev_c AS DOUBLE) / 10000.0 AS total_rev
    FROM srev JOIN supplier s ON s.s_suppkey = srev.l_suppkey, mx
    WHERE srev.rev_c = mx.max_c
    """,
)
def join_revenue_view_max(spark, sf_dir):
    """TPC-H Q15 shape: the top-revenue supplier(s) for 1998Q1 — an
    aggregated view compared against its own MAX. The max is a one-row
    broadcast; equality on the exact cents value keeps ties (TPC-H
    semantics) instead of an arbitrary LIMIT 1 pick."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    srev = li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_c"))
    mx = srev.agg(F.max("rev_c").alias("max_c"))
    return (
        srev.join(F.broadcast(mx))
        .where(F.col("rev_c") == F.col("max_c"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000.0).alias("total_rev"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue per customer, top 20


@query(
    "join_returned_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_sql_csum(
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})",
               "revenue", dp=4)}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def join_returned_topk(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year window — selective date + returnflag filters pushed to the
    scans, a 3-way join with a broadcast nation dim, grouped exact
    revenue, then TakeOrdered top-20 (custkey tiebreak makes the cut
    deterministic)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(csum(rev, "revenue", dp=4))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q9 — profit-style rollup by nation × order-year


@query(
    "join_profit_rollup",
    oracle=f"""
    SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {_sql_csum(
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})",
               "revenue", dp=4)}
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
)
def join_profit_rollup(spark, sf_dir):
    """TPC-H Q9 shape (adapted — no partsupp/supplycost in the synthetic
    schema): discounted revenue of '%gear%' parts by supplier nation ×
    order year. The part filter prunes the build side before the fact
    join; supplier/nation broadcast; one fact shuffle on orderkey."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(csum(rev, "revenue", dp=4))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation inside one customer region


@query(
    "join_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {_sql_csum(
               f"CASE WHEN sn.n_name = 'NATION_1' THEN "
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')}) "
               f"ELSE 0 END", "nation_rev", dp=4)},
           {_sql_csum(
               f"{_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})",
               "total_rev", dp=4)}
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
)
def join_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1 suppliers' share of revenue sold into
    ASIA-region customers, per order year. Both the conditional
    numerator and the denominator are exact fixed-point sums computed in
    ONE aggregation pass (no second scan for the total); the share
    itself is their ratio downstream — emitting both keeps the oracle
    comparison exact rather than hashing a float division."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = table(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"), F.col("n_regionkey").alias("cn_regionkey")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("sn_name")
    )
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    nat_rev = F.when(F.col("sn_name") == "NATION_1", rev).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
        .join(F.broadcast(r), F.col("cn_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(csum(nat_rev, "nation_rev", dp=4), csum(rev, "total_rev", dp=4))
    )


# ---------------------------------------------------------------------------
# Q21 — sole-latest-shipper on multi-supplier orders (EXISTS/NOT EXISTS)


@query(
    "subquery_exists_chain",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             MAX(l_shipdate) AS max_ship,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    ), latest AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN per_order po ON po.l_orderkey = l.l_orderkey
      WHERE l.l_shipdate = po.max_ship
    ), sole AS (
      SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
      FROM latest
      GROUP BY l_orderkey
      HAVING COUNT(*) = 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole
    JOIN per_order po ON po.l_orderkey = sole.l_orderkey AND po.n_supp >= 2
    JOIN supplier s ON s.s_suppkey = sole.l_suppkey
    GROUP BY s.s_name
    """,
)
def subquery_exists_chain(spark, sf_dir):
    """TPC-H Q21 shape (adapted to shipdate): for each supplier, how
    many multi-supplier orders they ALONE shipped last — the
    EXISTS (another supplier in the order) / NOT EXISTS (another
    supplier equally late) pair. Both existence tests collapse into one
    orderkey-shuffled aggregate (max shipdate + distinct-supplier count
    + sole-latest check) instead of per-row correlated rescans — the
    decorrelation Catalyst would have to discover from the nested SQL is
    written declaratively."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    latest = (
        li.join(per_order, "l_orderkey")
        .where(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        latest.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count("*").alias("n_latest"))
        .where(F.col("n_latest") == 1)
        .drop("n_latest")
    )
    return (
        sole.join(per_order.where(F.col("n_supp") >= 2), "l_orderkey")
        .join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q6 — the forecast-revenue-change scan: pure filter + single aggregate


@query(
    "agg_selective_revenue",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {_sql_csum(
               f"{_sql_cents('l_extendedprice')} * {_sql_cents('l_discount')}",
               "revenue_delta", dp=4)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24.0
    """,
)
def agg_selective_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the what-if revenue scan — three stacked
    selective predicates (date year, discount band, quantity cap) and
    one exact product-sum, no join, no group. The entire query should
    compile to scan-with-pushed-filters → partial agg → one-row final:
    the canonical test that predicates actually reach the parquet
    reader instead of filtering post-scan. With this, the registry
    covers every TPC-H query shape expressible on the synthetic schema
    (Q2/Q16/Q20 need partsupp, which the testdata omits)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24.0)
    )
    delta = cents("l_extendedprice") * cents("l_discount")
    return li.agg(F.count("*").alias("n_lines"), csum(delta, "revenue_delta", dp=4))


# ---------------------------------------------------------------------------
# the partsupp trio (Q2/Q16/Q20) — the three shapes the synthetic schema
# could not express until now. partsupp is DERIVED deterministically from
# part × supplier (4 suppliers per part, portable-hash qty/cost), so both
# engines construct the identical table and every shape stays hash-gated.

_H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
_DUCK_H60_PS = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

_DUCK_PARTSUPP = f"""
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i * 7) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
             1 + {_DUCK_H60_PS.format(x="concat(p_partkey, '-', i)")} % 9999
               AS ps_availqty,
             100 + {_DUCK_H60_PS.format(x="concat('c-', p_partkey, '-', i)")} % 100000
               AS ps_supplycost_cents
      FROM part, (SELECT unnest(range(4)) AS i) gen)"""


def _partsupp(spark, sf_dir):
    """Derived partsupp: 4 deterministic suppliers per part with
    portable-hash availqty/supplycost — engine-identical by
    construction (same md5-60 trick as the dedup oracles)."""
    n_supp = table(spark, sf_dir, "supplier").count()
    part = table(spark, sf_dir, "part").select("p_partkey")
    gen = part.select(
        "p_partkey", F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("i")
    )
    h = lambda x: F.expr(_H60.format(x=x))  # noqa: E731
    return gen.select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") + F.col("i") * 7) % F.lit(n_supp)).alias("ps_suppkey"),
        (F.lit(1) + h("concat(p_partkey, '-', i)") % 9999).alias("ps_availqty"),
        (F.lit(100) + h("concat('c-', p_partkey, '-', i)") % 100000).alias(
            "ps_supplycost_cents"
        ),
    )


@query(
    "subquery_min_cost_supplier",
    oracle=f"""
    WITH {_DUCK_PARTSUPP},
    eligible AS (
      SELECT ps.*, s.s_acctbal, s.s_name, s.s_nationkey, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA')
    SELECT p.p_partkey, p.p_type, e.s_name, e.n_name,
           e.s_acctbal, e.ps_supplycost_cents
    FROM part p JOIN eligible e ON p.p_partkey = e.ps_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'PROMO'
      AND e.ps_supplycost_cents = (
        SELECT MIN(e2.ps_supplycost_cents) FROM eligible e2
        WHERE e2.ps_partkey = p.p_partkey)
    """,
)
def subquery_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape — minimum-cost supplier per part within a region:
    a correlated scalar-MIN subquery over the derived partsupp,
    decorrelated by Catalyst into a per-part aggregate re-joined to the
    probe side (co-partitioned on ps_partkey, AQE-planned); region/
    nation/supplier dims broadcast. Ties (two suppliers at the min
    cost) are all kept — no LIMIT, so the result is order-free."""
    ps = _partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "PROMO")
    )
    eligible = (
        ps.join(s, ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_cents",
                "s_acctbal", "s_name", "n_name")
    )
    min_cost = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    return (
        p.join(eligible, p["p_partkey"] == eligible["ps_partkey"])
        .join(min_cost, "ps_partkey")
        .where(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .select("p_partkey", "p_type", "s_name", "n_name",
                "s_acctbal", "ps_supplycost_cents")
    )


@query(
    "agg_supplier_count_notin",
    oracle=f"""
    WITH {_DUCK_PARTSUPP}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 9, 16, 25)
      AND ps.ps_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def agg_supplier_count_notin(spark, sf_dir):
    """TPC-H Q16 shape — distinct-supplier census per (brand, type,
    size) with a NOT IN exclusion subquery (the "customer complaints"
    filter, stood in by negative-balance suppliers). Catalyst plans the
    NOT IN as a broadcast left-anti join (the exclusion list is tiny);
    the COUNT DISTINCT shuffles (group, suppkey) pairs once."""
    ps = _partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(bad, "ps_suppkey", "left_anti")
        .join(p, ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "subquery_excess_stock",
    oracle=f"""
    WITH {_DUCK_PARTSUPP},
    qualifying AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN qualifying q ON q.p_partkey = ps.ps_partkey
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty * 200 > sh.qty_cents)
    """,
)
def subquery_excess_stock(spark, sf_dir):
    """TPC-H Q20 shape — suppliers holding excess stock of qualifying
    parts: nested IN over partsupp with a correlated half-of-shipped
    threshold. The comparison availqty > 0.5·SUM(qty) is
    cross-multiplied to integers (availqty·200 > qty_cents) so no
    float boundary can flip a supplier between engines; the shipped
    aggregate is keyed (partkey, suppkey) — the same key as the
    partsupp probe, a co-partitioned join at scale."""
    ps = _partsupp(spark, sf_dir)
    qual = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        # Prune the fact BEFORE the aggregate exchange: shipped only
        # matters joined to qualifying parts, so a broadcast semi-join
        # on the (dimension-sized, filtered) qualifying keys drops
        # non-qualifying lineitem rows ahead of the groupBy shuffle —
        # result-identical (exact semi-join, the later ps⋈qual join
        # re-applies the same restriction).
        .join(
            F.broadcast(qual.select(F.col("ps_partkey").alias("l_partkey"))),
            "l_partkey",
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("qty_cents"))
    )
    excess = (
        ps.join(qual, "ps_partkey")
        .join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .where(F.col("ps_availqty") * 200 > F.col("qty_cents"))
        .select("ps_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(
        excess, s["s_suppkey"] == excess["ps_suppkey"]
    ).select("s_suppkey", "s_name").distinct()
