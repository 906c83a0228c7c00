"""Data-quality driver queries: column profiling + rule-based
quarantine over the events table (generalizing the reference's silent
publish-time filtering, reference dags/utils/etl.py:100-106)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..operators.quality import check_rules, profile
from . import query

_PROFILE_NUM = ["event_id", "user_id", "value"]
_PROFILE_STR = ["event_type"]


def _profile_arm(col: str, numeric: bool) -> str:
    if numeric:
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        mns, mxs = f"MIN({col})", f"MAX({col})"
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {mns} AS min_str, {mxs} AS max_str
    FROM events"""


@query(
    "dq_profile",
    oracle=" UNION ALL ".join(
        [_profile_arm(c, True) for c in _PROFILE_NUM]
        + [_profile_arm(c, False) for c in _PROFILE_STR]
    ),
)
def dq_profile(spark, sf_dir):
    """Column profile in ONE scan (multi-aggregate pass; the per-column
    UNION in the oracle is the semantic spec, not the plan) —
    operators/quality.py::profile."""
    return profile(table(spark, sf_dir, "events"), _PROFILE_NUM, _PROFILE_STR)


@query(
    "dq_quarantine",
    oracle="""
    WITH tagged AS (
        SELECT event_id, event_type, value,
               concat_ws(',',
                   CASE WHEN NOT coalesce(user_id IS NOT NULL, FALSE)
                        THEN 'has_user' END,
                   CASE WHEN NOT coalesce(
                            event_type IN ('click','view','purchase','signup'),
                            FALSE)
                        THEN 'known_type' END,
                   CASE WHEN NOT coalesce(value BETWEEN 0 AND 100, FALSE)
                        THEN 'value_in_range' END
               ) AS violations
        FROM events
    )
    SELECT event_id, event_type, value, violations
    FROM tagged WHERE violations <> ''
    """,
)
def dq_quarantine(spark, sf_dir):
    """Rows failing named validity rules, tagged with what they
    violated (rule NULL ⇒ violation: a row you can't prove valid is
    not valid). The reference silently drops such rows; quarantining
    keeps them auditable — operators/quality.py::check_rules."""
    ev = table(spark, sf_dir, "events")
    rules = {
        "has_user": F.col("user_id").isNotNull(),
        "known_type": F.col("event_type").isin("click", "view", "purchase", "signup"),
        "value_in_range": F.col("value").between(0, 100),
    }
    tagged = check_rules(ev.select("event_id", "event_type", "value", "user_id"), rules)
    return tagged.where(F.col("violations") != "").select(
        "event_id", "event_type", "value", "violations"
    )


@query(
    "dq_referential",
    oracle="""
    SELECT 'orders.custkey->customer' AS relationship,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS total
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'events.user_id->customer',
           CAST((SELECT COUNT(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM events) AS BIGINT)
    """,
)
def dq_referential(spark, sf_dir):
    """Referential-integrity audit across the star schema: orphan
    foreign keys per relationship via LEFT ANTI joins (the reference
    trusts its FK chain blindly — silver builds left-join and carry
    nulls, dags/utils/etl.py:518-553; this makes the trust checkable
    before publish). Each relationship is one anti-join against a
    broadcastable dim — at 100 TB the fact side streams once per
    relationship with no wide shuffle; a combined single-pass variant
    (one scan, four EXISTS flags) trades scan count for join fan-out
    and is the right shape when scans dominate."""
    from functools import reduce

    checks = [
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ]
    outs = []
    for name, fact, fk, dim, pk in checks:
        f, d = table(spark, sf_dir, fact), table(spark, sf_dir, dim)
        orphans = f.join(
            F.broadcast(d.select(F.col(pk).alias(fk))), fk, "left_anti"
        ).agg(F.count("*").alias("orphans"))
        total = f.agg(F.count("*").alias("total"))
        outs.append(
            orphans.crossJoin(total).select(
                F.lit(name).alias("relationship"), "orphans", "total"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


@query(
    "scan_csv_permissive",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents, event_type,
             event_id % 53 = 0 AS bad
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN bad THEN NULL ELSE cents END AS cents,
           event_type,
           CASE WHEN bad
                THEN event_id || ',' || user_id || ',N/A,' || event_type
                ELSE NULL END AS corrupt_record
    FROM src
    """,
)
def scan_csv_permissive(spark, sf_dir):
    """Malformed-record quarantine on CSV ingestion (PERMISSIVE +
    columnNameOfCorruptRecord): the reference trusts its CSV exports
    and would crash (FAILFAST default pandas) or silently coerce; here
    a bad field parses to NULL, the rest of the row survives, and the
    RAW line is captured for quarantine — verified by round-tripping
    events through CSV with every 53rd row's numeric field corrupted
    to 'N/A'. The oracle reconstructs the exact parse outcome,
    including the captured raw line. Per-line, schema-driven,
    splittable — the ingestion edge every landing pipeline needs."""
    from ..streaming.pipeline import scratch_dir

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_type",
    )
    line = F.concat_ws(
        ",",
        F.col("event_id"),
        F.col("user_id"),
        F.when(F.col("event_id") % 53 == 0, F.lit("N/A")).otherwise(
            F.col("cents").cast("string")
        ),
        F.col("event_type"),
    )
    path = scratch_dir("csv_permissive")
    ev.select(line.alias("value")).write.mode("overwrite").text(path)
    return (
        spark.read.schema(
            "event_id bigint, user_id bigint, cents bigint, event_type string,"
            " corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_record")
        .csv(path)
    )


@query(
    "dq_ks_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
               AS early
      FROM events
    ), per_value AS (
      SELECT event_type, v_c,
             SUM(early) AS c1, SUM(1 - early) AS c2
      FROM tagged GROUP BY event_type, v_c
    ), cum AS (
      SELECT event_type, v_c,
             SUM(c1) OVER (PARTITION BY event_type ORDER BY v_c) AS cum1,
             SUM(c2) OVER (PARTITION BY event_type ORDER BY v_c) AS cum2,
             SUM(c1) OVER (PARTITION BY event_type) AS n1,
             SUM(c2) OVER (PARTITION BY event_type) AS n2
      FROM per_value
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
           CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) AS ks
    FROM cum GROUP BY event_type
    """,
)
def dq_ks_drift(spark, sf_dir):
    """Distribution-drift detection: the exact two-sample
    Kolmogorov-Smirnov statistic between the first and second half of
    the month, per event type. The CDF comparison is cross-multiplied
    to integers (|cum1·n2 − cum2·n1|, exact at any scale), so the drift
    score's argmax — the thing an alert thresholds on — cannot flip
    under partial-aggregation order; one float division at the end
    reports the conventional [0,1] statistic. Shape: one (type, value)
    aggregate, one cumulative window per type, one grouped max — the
    same cost as an exact percentile, and the natural pre-training gate
    ('did this source's quality distribution move since the last
    snapshot?')."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    early = (
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
    ).cast("bigint")
    tagged = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        early.alias("early"),
    )
    per_value = tagged.groupBy("event_type", "v_c").agg(
        F.sum("early").alias("c1"), F.sum(1 - F.col("early")).alias("c2")
    )
    w_cum = Window.partitionBy("event_type").orderBy("v_c")
    w_all = Window.partitionBy("event_type")
    cum = per_value.select(
        "event_type",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    diff = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return cum.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(diff).alias("ks_num"),
        (
            F.max(diff).cast("double")
            / (F.max("n1").cast("double") * F.max("n2").cast("double"))
        ).alias("ks"),
    )


@query(
    "dq_skew_keys",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT key, n,
           CAST(n * 1000000 // total AS BIGINT) AS share_micro,
           CAST(SUM(n) OVER (ORDER BY n DESC, key ROWS UNBOUNDED PRECEDING)
                * 1000000 // total AS BIGINT) AS cum_share_micro
    FROM c, t
    ORDER BY n DESC, key LIMIT 10
    """,
)
def dq_skew_keys(spark, sf_dir):
    """Heavy-hitter key census — the diagnostic that DECIDES skew
    handling (join_salted applies it; AQE's skew-join split reacts to
    it at runtime): top-10 join keys by row count with exact integer
    micro-unit share and cumulative share. One map-side partial
    aggregation collapses the fact table to |distinct keys| rows, the
    top-k is a TakeOrdered over those — at 100 TB nothing but the key
    census ever moves, and the window runs on 10 rows post-limit...
    here on the census pre-limit, which is |keys|-bounded, never
    |rows|-bounded. Ties are totally ordered by (n DESC, key) so the
    oracle's LIMIT picks identical rows."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    census = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        census.withColumn("total", F.sum("n").over(Window.partitionBy()))
        .withColumn("cum_n", F.sum("n").over(w))
        .withColumn("share_micro", F.expr("CAST(n * 1000000 DIV total AS BIGINT)"))
        .withColumn(
            "cum_share_micro", F.expr("CAST(cum_n * 1000000 DIV total AS BIGINT)")
        )
        .orderBy(F.desc("n"), "key")
        .limit(10)
        .select("key", "n", "share_micro", "cum_share_micro")
    )


@query(
    "fn_column_mask",
    oracle="""
    SELECT c_custkey,
           substr(md5(concat('pii-v1:', c_name)), 1, 16) AS name_pseudonym,
           concat(substr(c_name, 1, 9), repeat('*', greatest(length(c_name) - 9, 0)))
             AS name_partial,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000) * 1000
                AS BIGINT) AS acctbal_band,
           c_mktsegment
    FROM customer
    """,
)
def fn_column_mask(spark, sf_dir):
    """Column-level masking for governed exports — the three standard
    de-identification transforms, all deterministic and engine-portable:
    a salted-md5 PSEUDONYM (stable token: joins and group-bys still
    work across masked datasets, but the value is unrecoverable without
    the salt), PARTIAL masking (fixed-length prefix kept, rest
    starred), and numeric GENERALIZATION (account balance coarsened to
    $1000 bands through the exact cents lift — no float floor drift at
    band edges). Pure scan-local projections: masking adds zero shuffle
    at any scale, which is why it belongs in the engine rather than a
    post-export script."""
    c = table(spark, sf_dir, "customer")
    name_len = F.length("c_name")
    return c.select(
        "c_custkey",
        F.substring(F.md5(F.concat(F.lit("pii-v1:"), F.col("c_name"))), 1, 16).alias(
            "name_pseudonym"
        ),
        F.concat(
            F.substring("c_name", 1, 9),
            F.repeat(F.lit("*"), F.greatest(name_len - 9, F.lit(0))),
        ).alias("name_partial"),
        (
            F.floor(
                F.round(F.col("c_acctbal") * 100).cast("bigint") / F.lit(100000)
            ).cast("bigint")
            * 1000
        ).cast("bigint").alias("acctbal_band"),
        "c_mktsegment",
    )


@query(
    "dq_volume_anomaly",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS dd, CAST(SUM(n_rows) AS BIGINT) AS ss,
             CAST(SUM(n_rows * n_rows) AS BIGINT) AS qq
      FROM d
    )
    SELECT day, n_rows,
           (n_rows * dd - ss) * (n_rows * dd - ss) > 4 * (dd * qq - ss * ss)
             AS is_anomaly
    FROM d, s
    """,
)
def dq_volume_anomaly(spark, sf_dir):
    """Ingestion-volume anomaly monitor: flag days whose row count sits
    more than 2σ from the mean — the alarm that catches a dropped feed
    or a duplicate replay before it reaches consumers. The 2σ test is
    evaluated WITHOUT division or sqrt: (n·D − S)² > 4·(D·Q − S²) in
    pure integers (S=Σn, Q=Σn²), so both engines flag identical days —
    a float z-score would disagree on boundary days. Integer regime:
    terms stay under int64 through ~10⁹ rows/day × 3 yr; past that,
    lift the squared terms with the hi/lo split agg_skew_kurtosis uses.
    One map-side-combined day census (|days| rows), a one-row moment
    broadcast, and a census-local flag — nothing else moves."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_rows")
    )
    s = d.agg(
        F.count("*").alias("dd"),
        F.sum("n_rows").alias("ss"),
        F.sum(F.col("n_rows") * F.col("n_rows")).alias("qq"),
    )
    j = d.crossJoin(F.broadcast(s))
    dev = F.col("n_rows") * F.col("dd") - F.col("ss")
    return j.select(
        "day",
        "n_rows",
        (dev * dev > 4 * (F.col("dd") * F.col("qq") - F.col("ss") * F.col("ss"))).alias(
            "is_anomaly"
        ),
    )


@query(
    "dq_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN value IS NULL THEN 1 END) AS BIGINT) AS n_null_value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
             WHERE event_type = 'purchase') AS n_purchases
    FROM events
    """,
)
def dq_observe_metrics(spark, sf_dir):
    """Pipeline-embedded metrics via the Observation API: the DQ
    aggregates ride the SAME pass as the main job (here a filtered
    noop publish), so at 100 TB input profiling costs zero extra scans
    — the always-on alternative to dq_profile's dedicated audit. The
    observed values are exact integer/count aggregates, returned as a
    one-row frame and hash-gated like any query."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation()
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        F.max(F.round(F.col("value") * 100).cast("bigint")).alias("max_cents"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    # the "main job": publish the purchase slice; metrics describe the
    # full input and materialize as a side effect of this one action
    observed.where(F.col("event_type") == "purchase").write.format("noop").mode(
        "overwrite"
    ).save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_value"]),
                int(m["sum_cents"]),
                int(m["max_cents"]),
                int(m["n_purchases"]),
            )
        ],
        "n_rows bigint, n_null_value bigint, sum_cents bigint, max_cents bigint,"
        " n_purchases bigint",
    )


@query(
    "fn_governed_view",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'HIGH' ELSE 'LOW' END AS price_band,
           concat('cust-', md5(concat('pepper-', CAST(o_custkey AS VARCHAR)))) AS cust_pseudo
    FROM orders
    WHERE o_orderstatus <> 'F'
    """,
)
def fn_governed_view(spark, sf_dir):
    """Governed access layer: consumers query a VIEW that composes
    row-level security (finished orders filtered out) with column
    governance (customer key salted-pseudonymized, price generalized
    to bands) — the masks of fn_column_mask packaged as the actual
    access pattern (view-in-front-of-table), so no consumer query can
    reach the raw columns. The view body is plain SQL over the scan:
    Catalyst inlines it, pushes the row filter into parquet, and never
    materializes the unmasked frame."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_raw_gv")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW orders_governed AS
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 100000 THEN 'HIGH' ELSE 'LOW' END
                 AS price_band,
               concat('cust-', md5(concat('pepper-', CAST(o_custkey AS STRING))))
                 AS cust_pseudo
        FROM orders_raw_gv
        WHERE o_orderstatus <> 'F'
        """
    )
    return spark.sql("SELECT * FROM orders_governed")


@query(
    "dq_reconciliation",
    oracle="""
    WITH src AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1),
    pub AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  + CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                         THEN 1 ELSE 0 END AS BIGINT) AS cents
      FROM events GROUP BY 1)
    SELECT s.day, s.n AS src_rows, p.n AS pub_rows,
           s.cents AS src_cents, p.cents AS pub_cents,
           CASE WHEN s.n = p.n AND s.cents = p.cents
                THEN 'match' ELSE 'MISMATCH' END AS status
    FROM src s JOIN pub p USING (day)
    """,
)
def dq_reconciliation(spark, sf_dir):
    """Source-to-warehouse reconciliation — the audit every migration
    and every layered pipeline needs: per-partition row counts AND
    integer checksums compared between the source and the published
    table, so silent row loss, duplication, or value corruption is
    localized to the exact partition day. One corrupted cent is
    planted in the published side; the report must flag exactly that
    day (and the hash gate proves the reconciliation itself is
    engine-exact). Both sides are partition-grain aggregates —
    census-sized shuffle, never a row-level diff (table_diff is the
    row-grain escalation once a partition flags)."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    src = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("src_rows"), F.sum(cents).alias("src_cents")
    )
    # published side: replayed publish with one planted corruption
    pub = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("pub_rows"),
        (
            F.sum(cents)
            + F.when(
                F.to_date(F.min("ts")) == F.lit("2024-01-05").cast("date"), 1
            ).otherwise(0)
        ).alias("pub_cents"),
    )
    rec = src.join(pub, "day")
    return rec.select(
        "day",
        "src_rows",
        "pub_rows",
        "src_cents",
        "pub_cents",
        F.when(
            (F.col("src_rows") == F.col("pub_rows"))
            & (F.col("src_cents") == F.col("pub_cents")),
            F.lit("match"),
        )
        .otherwise(F.lit("MISMATCH"))
        .alias("status"),
    )


@query(
    "dq_join_guard",
    oracle="""
    WITH dim AS (
      SELECT event_type, 0 AS variant FROM (SELECT DISTINCT event_type FROM events)
      UNION ALL
      SELECT event_type, 1 AS variant FROM (SELECT DISTINCT event_type FROM events)
        WHERE event_type IN ('click', 'view')),
    mult AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS dim_mult
      FROM dim GROUP BY event_type),
    lefts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_left
      FROM events GROUP BY event_type)
    SELECT l.event_type, m.dim_mult, l.n_left,
           l.n_left * m.dim_mult AS n_joined
    FROM lefts l JOIN mult m USING (event_type)
    WHERE m.dim_mult > 1
    """,
)
def dq_join_guard(spark, sf_dir):
    """Join fan-out guard: a fact⟕dim join against a dim with
    accidentally duplicated keys silently multiplies fact rows — the
    classic double-counting bug. The guard rides the join itself via
    two Observation metrics (input rows, output rows — CollectMetrics,
    zero extra scans, same machinery as dq_observe_metrics) and trips
    when out/in exceeds the declared ceiling; the offender report
    (which keys, what multiplicity, how many joined rows) is one
    census-sized aggregate. Here the dim carries planted duplicates on
    two keys; the guard MUST trip (asserted in-query) and the report
    is hash-checked. At 100 TB the detection is free — the metrics
    ride the pass the join already makes."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    base_dim = ev.select("event_type").distinct()
    dim = base_dim.select("event_type", F.lit(0).alias("variant")).unionAll(
        base_dim.where(F.col("event_type").isin("click", "view")).select(
            "event_type", F.lit(1).alias("variant")
        )
    )
    obs_in, obs_out = Observation(), Observation()
    joined = (
        ev.observe(obs_in, F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(dim), "event_type")
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )
    report = (
        joined.groupBy("event_type")
        .agg(
            F.countDistinct("variant").cast("bigint").alias("dim_mult"),
            (F.count("*") / F.countDistinct("variant")).cast("bigint").alias("n_left"),
            F.count("*").cast("bigint").alias("n_joined"),
        )
        .where(F.col("dim_mult") > 1)
    )
    rows = report.collect()  # one action drives join + both metrics
    n_in, n_out = obs_in.get["n"], obs_out.get["n"]
    assert n_out / n_in > 1.05, (n_in, n_out)  # the guard must trip
    return spark.createDataFrame(
        rows, "event_type string, dim_mult bigint, n_left bigint, n_joined bigint"
    )


@query(
    "fn_crypto_shred",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events)
    SELECT user_id,
           CASE WHEN user_id % 13 = 0 THEN NULL
                ELSE concat('contact-', CAST(user_id AS VARCHAR)) END AS pii,
           user_id % 13 = 0 AS shredded
    FROM users
    """,
)
def fn_crypto_shred(spark, sf_dir):
    """Crypto-shredding — the GDPR erasure pattern that never rewrites
    data: PII is stored AES-GCM-encrypted under a per-user key held in
    a separate key vault; right-to-erasure deletes the user's KEY ROW
    (an O(1) vault delete), after which the ciphertext — still sitting
    in every file, backup, and clone — is unrecoverable. The
    complement of merge_on_read_delete (which physically erases): at
    100 TB, shredding turns an erasure wave from a table rewrite into
    a vault merge. Here users ≡ 0 (mod 13) are shredded; decryption
    via vault join must recover every retained user's PII exactly and
    NULL for shredded users (the ciphertext column is asserted
    non-readable without the key) — hash-gated against the plaintext
    truth."""
    users = table(spark, sf_dir, "events").select("user_id").distinct()
    pii = users.select(
        "user_id",
        F.concat(F.lit("contact-"), F.col("user_id").cast("string")).alias("pii"),
    )
    # per-user data key: 16-byte derived key (stand-in for a KMS key)
    vault_all = users.select(
        "user_id", F.expr("substr(md5(concat('key#', cast(user_id as string))), 1, 16)").alias("dek")
    )
    encrypted = (
        pii.join(vault_all, "user_id")
        .select(
            "user_id",
            F.expr("aes_encrypt(cast(pii as binary), dek, 'GCM')").alias("ct"),
        )
    )
    # the erasure wave: keys for user_id % 13 == 0 are destroyed
    vault = vault_all.where(F.col("user_id") % 13 != 0)
    recovered = (
        encrypted.join(F.broadcast(vault), "user_id", "left")
        .select(
            "user_id",
            F.when(
                F.col("dek").isNotNull(),
                F.expr("cast(aes_decrypt(ct, dek, 'GCM') as string)"),
            ).alias("pii"),
            F.col("dek").isNull().alias("shredded"),
        )
    )
    return recovered


@query(
    "agg_dp_noise",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
      GROUP BY event_type),
    u01 AS (
      SELECT event_type, n,
             (CAST(CAST(concat('0x', substr(md5(concat('dp-seed-1#', event_type)), 1, 15))
                   AS BIGINT) % 1048576 AS DOUBLE) + 0.5) / 1048576.0 AS u
      FROM counts)
    SELECT event_type, n,
           CAST(ROUND((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                * ln(1.0 - 2.0 * abs(u - 0.5)) * 1000000.0) AS BIGINT)
             AS noise_micro,
           n * 1000000 + CAST(ROUND((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                * ln(1.0 - 2.0 * abs(u - 0.5)) * 1000000.0) AS BIGINT)
             AS noisy_micro
    FROM u01
    """,
)
def agg_dp_noise(spark, sf_dir):
    """Differentially-private release of group counts: Laplace(1/ε)
    noise (ε=1, sensitivity 1) via inverse-CDF sampling
    x = −b·sgn(u−½)·ln(1−2|u−½|) from a SEEDED uniform — the portable
    md5-60 hash of (release-seed, group) over a 2²⁰ grid, offset by
    half a cell so u ∈ (0,1) and u ≠ ½ exactly. Reproducible noise
    per (seed, group) is the auditable-DP deployment shape (a fresh
    release = a fresh seed; replaying a release must give identical
    noise, or the privacy accounting is fiction). The one scalar ln
    per GROUP is rounded to micro-units before any arithmetic — the
    same engine-agreement discipline as text_bm25's idf. Noise rides
    the census aggregation: |groups| state, zero extra passes."""
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    u = (
        (
            F.expr(
                "cast(pmod(cast(conv(substr(md5(concat('dp-seed-1#', event_type)), 1, 15), 16, 10) as bigint), 1048576) as double)"
            )
            + F.lit(0.5)
        )
        / F.lit(1048576.0)
    ).alias("u")
    noise = F.round(
        F.when(F.col("u") >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("u") - F.lit(0.5)))
        * F.lit(1000000.0)
    ).cast("bigint")
    return (
        counts.select("event_type", "n", u)
        .withColumn("noise_micro", noise)
        .select(
            "event_type",
            "n",
            "noise_micro",
            (F.col("n") * 1000000 + F.col("noise_micro")).alias("noisy_micro"),
        )
    )
