"""Time-series query family over the events stream (SURVEY §2.4/§2.5
generalizations, part 4).

The reference's only time-series operation is a per-day gold report
(dags/utils/dwh/gold/attendance_report.py: date bucketing + group
aggregation); this module widens it to the standard warehouse
time-series toolkit: OHLC bar resampling, bounded-window EWMA smoothing,
median/MAD robust outlier flagging, and lagged cross-correlation of two
daily series. Every query is oracle-backed with integer-exact
arithmetic — medians are discrete (rank-crossing selection, no
interpolation), EWMA numerator/denominator are exact bigints with one
final double division, correlation is assembled from exact integer
moments — so Spark's partial-aggregation order can never flip a value
against DuckDB's serial order.

Scale notes (100 TB posture):
  - every per-key window sorts within (key) partitions after one hash
    shuffle; keys here (event_type, user_id) are the natural partition
    keys a production bar/smoothing job would use, and no window spans
    the whole table unpartitioned;
  - ts_ohlc_resample aggregates rank-tagged rows instead of exploding
    per-bar arrays, so the shuffle carries one row per event, and the
    output one row per (type, hour) bar;
  - ts_ewma is O(K) lag taps per row (K=12 compile-time constant) —
    whole-stage-codegen arithmetic, no UDF, no per-row state object;
  - ts_lag_corr reduces each daily series to one row per day before the
    spine join, then to a single moments row — the big scan happens
    exactly once per series.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import joins
from . import query
from .core import _sql_cents, _sql_csum, cents, csum

# ---------------------------------------------------------------------------
# OHLC bar resampling — one row per (event_type, hour) bar


@query(
    "ts_ohlc_resample",
    oracle=f"""
    WITH t AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour,
             {_sql_cents("value")} AS v_c,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_hour,
           CAST(MIN(CASE WHEN rn_a = 1 THEN v_c END) AS DOUBLE) / 100.0 AS open,
           CAST(MAX(v_c) AS DOUBLE) / 100.0 AS high,
           CAST(MIN(v_c) AS DOUBLE) / 100.0 AS low,
           CAST(MIN(CASE WHEN rn_d = 1 THEN v_c END) AS DOUBLE) / 100.0 AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           {_sql_csum("v_c", "vsum")}
    FROM t GROUP BY event_type, bar_hour
    """,
)
def ts_ohlc_resample(spark, sf_dir):
    """Downsample the event stream to hourly OHLC bars per event type:
    open/close are the first/last value in (ts, event_id) order —
    event_id breaks timestamp ties deterministically — high/low/volume/
    vsum are plain aggregates. Rank-tagging + conditional aggregation
    needs one shuffle on the bar key and no collect_list
    materialization of bar members."""
    ev = table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts")).alias("bar_hour")
    v_c = cents("value")
    wa = Window.partitionBy("event_type", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bar_hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    t = ev.select(
        "event_type", bar, v_c.alias("v_c"), "ts", "event_id"
    ).withColumns(
        {"rn_a": F.row_number().over(wa), "rn_d": F.row_number().over(wd)}
    )
    return t.groupBy("event_type", "bar_hour").agg(
        (F.min(F.when(F.col("rn_a") == 1, F.col("v_c"))).cast("double") / 100.0).alias("open"),
        (F.max("v_c").cast("double") / 100.0).alias("high"),
        (F.min("v_c").cast("double") / 100.0).alias("low"),
        (F.min(F.when(F.col("rn_d") == 1, F.col("v_c"))).cast("double") / 100.0).alias("close"),
        F.count("*").alias("volume"),
        csum(F.col("v_c"), "vsum"),
    )


# ---------------------------------------------------------------------------
# Bounded-window EWMA — exact bigint accumulation, one final division

_EWMA_K = 12  # taps; alpha = 1/4 → per-tap weight 3^j * 4^(K-1-j), exact ints
_EWMA_W = [3**j * 4 ** (_EWMA_K - 1 - j) for j in range(_EWMA_K)]


def _ewma_sql_terms() -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN lag(v_c, {j}) OVER w IS NOT NULL"
        f" THEN lag(v_c, {j}) OVER w * {w} ELSE 0 END"
        for j, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(v_c, {j}) OVER w IS NOT NULL THEN {w} ELSE 0 END"
        for j, w in enumerate(_EWMA_W)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()


@query(
    "ts_ewma",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, {_sql_cents("value")} AS v_c, ts
      FROM events
    )
    SELECT user_id, event_id,
           (CAST({_EWMA_NUM} AS DOUBLE)
            / CAST({_EWMA_DEN} AS DOUBLE)) / 100.0 AS ewma
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of each user's event
    values, alpha=1/4 over a bounded K=12-tap window. The weights
    3^j·4^(K-1-j) are exact integers, so numerator and denominator
    accumulate as bigints (max |num| ≈ 5e4·(4^12−3^12) ≈ 8e11, far
    inside int64) and the ONLY float operation is one final division —
    bit-identical across engines. Early rows renormalize over the taps
    that exist (the CASE denominator), the standard adjusted-EWMA
    convention."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select("user_id", "event_id", cents("value").alias("v_c"), "ts")
    lags = [F.lag("v_c", j).over(w) for j in range(_EWMA_K)]
    num = reduce(
        lambda a, b: a + b,
        [
            F.when(lag.isNotNull(), lag * F.lit(wt)).otherwise(F.lit(0))
            for lag, wt in zip(lags, _EWMA_W)
        ],
    )
    den = reduce(
        lambda a, b: a + b,
        [
            F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
            for lag, wt in zip(lags, _EWMA_W)
        ],
    )
    return t.select(
        "user_id",
        "event_id",
        ((num.cast("double") / den.cast("double")) / 100.0).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Median + MAD robust outlier profile — discrete (rank-crossing) selection


@query(
    "ts_mad_outlier",
    oracle=f"""
    WITH t AS (
      SELECT event_type, event_id, {_sql_cents("value")} AS v_c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {_sql_cents("value")}, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type,
             MIN(CASE WHEN rk * 2 >= n THEN v_c END) AS med_c
      FROM t GROUP BY event_type
    ), dev AS (
      SELECT t.event_type, abs(t.v_c - med.med_c) AS d_c,
             row_number() OVER (PARTITION BY t.event_type
                                ORDER BY abs(t.v_c - med.med_c), t.event_id) AS rk,
             COUNT(*) OVER (PARTITION BY t.event_type) AS n
      FROM t JOIN med ON med.event_type = t.event_type
    ), mad AS (
      SELECT event_type,
             MIN(CASE WHEN rk * 2 >= n THEN d_c END) AS mad_c
      FROM dev GROUP BY event_type
    )
    SELECT t.event_type,
           CAST(MIN(med.med_c) AS DOUBLE) / 100.0 AS median,
           CAST(MIN(mad.mad_c) AS DOUBLE) / 100.0 AS mad,
           CAST(COUNT(CASE WHEN abs(t.v_c - med.med_c) > 3 * mad.mad_c
                      THEN 1 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t
    JOIN med ON med.event_type = t.event_type
    JOIN mad ON mad.event_type = t.event_type
    GROUP BY t.event_type
    """,
)
def ts_mad_outlier(spark, sf_dir):
    """Robust per-type outlier profile: exact discrete median, exact
    median-absolute-deviation, and the count of events beyond the
    3-MAD fence. Discrete selection (smallest element whose rank
    crosses n/2, event_id tiebreak) keeps every intermediate an
    integer — no percentile interpolation for two engines to disagree
    on. Two rank passes per type (values, then deviations) are the
    irreducible cost of an exact MAD; both reuse the same event_type
    hash partitioning. The 5-row median/MAD tables broadcast back."""
    ev = table(spark, sf_dir, "events")
    v_c = cents("value")
    wv = Window.partitionBy("event_type").orderBy(v_c, "event_id")
    wn = Window.partitionBy("event_type")
    t = ev.select("event_type", "event_id", v_c.alias("v_c")).withColumns(
        {"rk": F.row_number().over(wv.orderBy("v_c", "event_id")), "n": F.count("*").over(wn)}
    )
    med = t.groupBy("event_type").agg(
        F.min(F.when(F.col("rk") * 2 >= F.col("n"), F.col("v_c"))).alias("med_c")
    )
    dev = t.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "v_c", (F.abs(F.col("v_c") - F.col("med_c"))).alias("d_c")
    )
    wd = Window.partitionBy("event_type").orderBy("d_c", "event_id")
    dev = dev.withColumns({"rk": F.row_number().over(wd), "n": F.count("*").over(wn)})
    mad = dev.groupBy("event_type").agg(
        F.min(F.when(F.col("rk") * 2 >= F.col("n"), F.col("d_c"))).alias("mad_c")
    )
    return (
        t.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.min("med_c").cast("double") / 100.0).alias("median"),
            (F.min("mad_c").cast("double") / 100.0).alias("mad"),
            F.count(
                F.when(F.abs(F.col("v_c") - F.col("med_c")) > 3 * F.col("mad_c"), 1)
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation of two daily series, exact integer moments


@query(
    "ts_lag_corr",
    oracle="""
    WITH days AS (
      SELECT unnest(generate_series(
               (SELECT MIN(date_trunc('day', ts)) FROM events),
               (SELECT MAX(date_trunc('day', ts)) FROM events),
               INTERVAL 1 DAY)) AS d
    ), vx AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), vy AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), pairs AS (
      SELECT COALESCE(vx.x, 0) AS x, COALESCE(vy.y, 0) AS y
      FROM days
      LEFT JOIN vx ON vx.d = days.d
      LEFT JOIN vy ON vy.d = days.d + INTERVAL 1 DAY
      WHERE days.d + INTERVAL 1 DAY
            <= (SELECT MAX(date_trunc('day', ts)) FROM events)
    ), m AS (
      -- outer CASTs: DuckDB SUM(BIGINT)->HUGEINT->float64 in pandas
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT n, sx, sy, sxy, sxx, syy,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_lag1
    FROM m
    """,
)
def ts_lag_corr(spark, sf_dir):
    """Does today's view count predict tomorrow's purchase count?
    Pearson correlation of the two daily series at lag 1, over a
    gap-filled calendar spine (missing days count as 0 — dropping them
    would silently bias the estimate). Each series reduces to one row
    per day before the spine join; the correlation is assembled from
    six exact integer moments with floats entering only in the final
    expression, so the value is bit-stable across engines and
    partitionings."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
        "d1",
    )
    vx = (
        ev.where(F.col("event_type") == "view")
        .groupBy(day.alias("d"))
        .agg(F.count("*").alias("x"))
    )
    vy = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day.alias("d"))
        .agg(F.count("*").alias("y"))
    )
    nxt = F.col("d") + F.expr("INTERVAL 1 DAY")
    pairs = (
        spine.where(nxt <= F.col("d1"))
        .join(vx, "d", "left")
        .join(vy.withColumnRenamed("d", "d_y"), nxt == F.col("d_y"), "left")
        .select(
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        (cov.cast("double") / F.sqrt(varx.cast("double") * vary.cast("double"))).alias(
            "corr_lag1"
        ),
    )


# ---------------------------------------------------------------------------
# Running distinct count — first-occurrence flag + running sum


@query(
    "window_running_distinct",
    oracle="""
    WITH flags AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    -- outer CAST: DuckDB windowed SUM(int)->HUGEINT->float64 in pandas
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS distinct_types
    FROM flags
    """,
)
def window_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) — how many distinct event types each
    user has touched as of every event. A naive running-distinct needs
    per-row set state; flagging only the FIRST occurrence of each
    (user, type) and running-summing the flags turns it into two plain
    windows — the first partitioned by (user, type), the second by
    user, so the wider shuffle reuses the narrower one's ordering and
    no membership set ever materializes."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flags = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flags.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).alias("distinct_types"),
    )


# ---------------------------------------------------------------------------
# Ordered event-sequence pattern count — MATCH_RECOGNIZE-lite


@query(
    "window_pattern_seq",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3 AS BIGINT)
             AS n_vcp
    FROM s
    """,
)
def window_pattern_seq(spark, sf_dir):
    """Sequential-pattern counting (MATCH_RECOGNIZE-lite): collapse each
    user's event history to an initial-letter string in strict
    (ts, event_id) order and count view→click→purchase runs with
    length arithmetic — replace() is engine-portable where regex
    engines differ on overlap rules. The per-user string is bounded by
    the user's event count (the same per-key regime as sessionization);
    building it with array_sort over (ts, event_id, initial) structs
    keeps ordering deterministic without relying on collect_list's
    undefined order."""
    ev = table(spark, sf_dir, "events")
    init = F.substring("event_type", 1, 1)
    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", init.alias("c")))
        ).alias("arr")
    )
    seq = F.array_join(F.transform("arr", lambda s: s["c"]), "")
    return g.select(
        "user_id",
        F.length(seq).cast("bigint").alias("seq_len"),
        ((F.length(seq) - F.length(F.replace(seq, F.lit("vcp"), F.lit("")))) / 3)
        .cast("bigint")
        .alias("n_vcp"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution — purchases credited to the preceding touchpoint


@query(
    "window_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS v_c,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS prev_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN prev_ts IS NOT NULL AND ts - prev_ts <= INTERVAL 7 DAY
                THEN prev_type ELSE 'direct' END AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(v_c) AS DOUBLE) / 100.0 AS attributed_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY CASE WHEN prev_ts IS NOT NULL AND ts - prev_ts <= INTERVAL 7 DAY
                  THEN prev_type ELSE 'direct' END
    """,
)
def window_attribution(spark, sf_dir):
    """Last-touch marketing attribution: credit each purchase to the
    user's most recent non-purchase touchpoint within a 7-day lookback,
    else 'direct'. The preceding touchpoint comes from
    last_value(... IGNORE NULLS) over a 1-preceding frame — one sorted
    pass per user, the same idiom as join_nearest_event, with no
    per-purchase rescan of history. Two parallel last_values (type and
    ts) stay consistent because the same CASE masks both."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    t = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        cents("value").alias("v_c"),
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("prev_type"),
        F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("prev_ts"),
    )
    in_window = F.col("prev_ts").isNotNull() & (
        F.col("ts") - F.col("prev_ts") <= F.expr("INTERVAL 7 DAY")
    )
    touch = F.when(in_window, F.col("prev_type")).otherwise(F.lit("direct"))
    return (
        t.where(F.col("event_type") == "purchase")
        .groupBy(touch.alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            csum(F.col("v_c"), "attributed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Maximum drawdown — running peak vs running balance, all integer


@query(
    "window_drawdown",
    oracle="""
    WITH bal AS (
      SELECT user_id, ts, event_id,
             SUM(CASE WHEN event_type = 'purchase' THEN -1 ELSE 1 END
                 * CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS cum_c
      FROM events
    ), peak AS (
      SELECT user_id,
             cum_c,
             MAX(cum_c) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS peak_c
      FROM bal
    )
    SELECT user_id,
           CAST(MAX(peak_c - cum_c) AS BIGINT) AS max_drawdown_c,
           CAST(MAX(peak_c) AS BIGINT) AS peak_c
    FROM peak GROUP BY user_id
    """,
)
def window_drawdown(spark, sf_dir):
    """Maximum drawdown per user: the deepest drop of the running
    signed balance (purchases are outflows, everything else inflows)
    below its own running peak — the risk metric every portfolio/
    treasury dashboard carries, and without the sign split it is
    degenerate here (all-positive flows make the balance its own peak).
    Two stacked windows over the SAME (user, ts, event_id) sort —
    Spark computes both in one shuffle+sort pass — and every quantity
    stays integer cents, so the max is exact under any partitioning."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flow = (
        F.when(F.col("event_type") == "purchase", -1).otherwise(1)
        * cents("value")
    )
    bal = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(flow).over(w).alias("cum_c"),
    )
    peak = bal.select(
        "user_id", "cum_c", F.max("cum_c").over(w).alias("peak_c")
    )
    return peak.groupBy("user_id").agg(
        F.max(F.col("peak_c") - F.col("cum_c")).alias("max_drawdown_c"),
        F.max("peak_c").alias("peak_c"),
    )


# ---------------------------------------------------------------------------
# As-of join with tolerance — nearest prior touch, but only if fresh enough


@query(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts AS v_ts, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events WHERE event_type = 'view'
    ), matched AS (
      SELECT p.user_id, p.event_id, p.ts,
             (SELECT MAX(v.v_ts) FROM views v
              WHERE v.user_id = p.user_id AND v.v_ts <= p.ts) AS v_ts
      FROM purchases p
    )
    SELECT m.user_id, m.event_id,
           CASE WHEN m.v_ts IS NOT NULL AND m.ts - m.v_ts <= INTERVAL 1 HOUR
                THEN v.v_c END AS view_c,
           CASE WHEN m.v_ts IS NOT NULL AND m.ts - m.v_ts <= INTERVAL 1 HOUR
                THEN epoch_us(m.ts) - epoch_us(m.v_ts) END AS gap_us
    FROM matched m
    LEFT JOIN views v ON v.user_id = m.user_id AND v.v_ts = m.v_ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`, kdb
    wj's window bound): each purchase matches the newest prior view,
    but only if it is at most an hour old — staler matches null out
    rather than silently attributing to ancient history. Implemented on
    the native union+window as-of (operators/joins.py:asof_join) by
    carrying the matched right timestamp through the atomic row struct
    and post-filtering: the tolerance is a projection over the as-of
    output, not a second join. Gap reported in exact integer
    microseconds."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        cents("value").alias("v_c"),
    )
    out = joins.asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="v_ts",
        right_cols=["v_ts", "v_c"],
    )
    fresh = F.col("v_ts").isNotNull() & (
        F.col("ts") - F.col("v_ts") <= F.expr("INTERVAL 1 HOUR")
    )
    return out.select(
        "user_id",
        "event_id",
        F.when(fresh, F.col("v_c")).alias("view_c"),
        F.when(
            fresh, F.unix_micros("ts") - F.unix_micros("v_ts")
        ).alias("gap_us"),
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH ver0 AS (
      SELECT user_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC)
               AS rn
      FROM events WHERE event_id % 2 = 0
    ), ver AS (
      SELECT user_id, ts AS dim_valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS dim_cents
      FROM ver0 WHERE rn = 1
    ), f AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 1
    )
    SELECT f.event_id, f.user_id, f.ts,
           CASE WHEN v.dim_valid_from <= f.ts
                     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
                THEN v.dim_valid_from END AS dim_valid_from,
           CASE WHEN v.dim_valid_from <= f.ts
                     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
                THEN v.dim_cents END AS dim_cents
    FROM f ASOF LEFT JOIN ver v
      ON f.user_id = v.user_id AND v.dim_valid_from <= f.ts
    """,
)
def join_point_in_time(spark, sf_dir):
    """Feature-store point-in-time join — each training fact is paired
    with the dim version VALID AT ITS OWN TIMESTAMP (valid_from <= ts <
    valid_to over the SCD2 version chain), never a later one: the
    label-leakage guard every feature pipeline needs. Tombstone
    versions ('error' events play the delete) match the interval but
    carry NULL attributes, so "deleted at fact time" (valid_from set,
    cents NULL) is distinct from "no version yet" (both NULL). Because
    versions chain contiguously, the interval match IS the newest-prior
    match — so the plan is operators/joins.py::asof_join (union + one
    keyed window, single shuffle), never a range-join blowup. The
    oracle matches via DuckDB's own ASOF JOIN machinery (an independent
    implementation — sorted merge, not a union+window) and then RE-
    CHECKS the explicit interval contract in the projection (the CASE
    nulls out any match whose [valid_from, valid_to) does not contain
    ts — provably a no-op on contiguous chains, so a violation surfaces
    as a hash mismatch). The oracle's previous plain interval LEFT JOIN
    stated the same contract but drew a quadratic DuckDB plan at the
    100× twin (30+ min vs 3 s; the two forms EXCEPT-ALL-verified
    bit-identical both ways at sf0.01, round 8). Same-(user, ts)
    version collisions dedup to the highest event_id — exactly the row
    whose interval is non-empty."""
    from pyspark.sql import Window

    from ..operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    ver = (
        ev.where(F.col("event_id") % 2 == 0)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "user_id",
            F.col("ts").alias("dim_valid_from"),
            F.when(F.col("event_type") == "error", F.lit(None).cast("bigint"))
            .otherwise(F.round(F.col("value") * 100).cast("bigint"))
            .alias("dim_cents"),
        )
    )
    facts = ev.where(F.col("event_id") % 2 == 1).select("event_id", "user_id", "ts")
    return asof_join(
        facts,
        ver,
        key="user_id",
        left_ts="ts",
        right_ts="dim_valid_from",
        right_cols=["dim_valid_from", "dim_cents"],
    ).select("event_id", "user_id", "ts", "dim_valid_from", "dim_cents")


@query(
    "ts_vwap",
    oracle="""
    WITH x AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_quantity * 100) AS BIGINT) AS qhun
      FROM lineitem
    )
    SELECT month,
           CAST(SUM(cents * qhun) AS BIGINT) AS sum_pq,
           CAST(SUM(qhun) AS BIGINT) AS sum_q,
           CAST(SUM(cents * qhun) * 100 // SUM(qhun) AS BIGINT) AS vwap_micro
    FROM x GROUP BY month
    """,
)
def ts_vwap(spark, sf_dir):
    """Volume-weighted average price per ship month — the weighted-mean
    shape (VWAP / blended unit economics) done exactly: price rides in
    cents, quantity in hundredths, the weighted numerator Σ(price·qty)
    accumulates as bigint products (≤5·10¹⁰ per row — int64 holds
    through ~10⁸ rows/group; past that, DECIMAL(38,0) the two sums),
    and the final ratio is ONE integer floor division to micro-dollar
    units. A float-weighted mean would drift by partial-agg order;
    this cannot. Map-side partial sums only — one |months|-row shuffle."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    qhun = F.round(F.col("l_quantity") * 100).cast("bigint")
    return (
        li.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            (cents * qhun).alias("pq"),
            qhun.alias("q"),
        )
        .groupBy("month")
        .agg(F.sum("pq").alias("sum_pq"), F.sum("q").alias("sum_q"))
        .select(
            "month",
            "sum_pq",
            "sum_q",
            F.expr("CAST(sum_pq * 100 DIV sum_q AS BIGINT)").alias("vwap_micro"),
        )
    )


@query(
    "ts_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
    bounds AS (
      SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM daily),
    spine AS (
      SELECT u.user_id, CAST(d.d AS BIGINT) AS day_num
      FROM (SELECT DISTINCT user_id FROM daily) u,
           (SELECT unnest(range((SELECT lo FROM bounds),
                                (SELECT hi FROM bounds) + 1)) AS d) d),
    j AS (
      SELECT s.user_id, s.day_num, daily.cents,
             last_value(CASE WHEN daily.cents IS NOT NULL THEN s.day_num END
               IGNORE NULLS) OVER w_prev AS d_prev,
             last_value(daily.cents IGNORE NULLS) OVER w_prev AS v_prev,
             first_value(CASE WHEN daily.cents IS NOT NULL THEN s.day_num END
               IGNORE NULLS) OVER w_next AS d_next,
             first_value(daily.cents IGNORE NULLS) OVER w_next AS v_next
      FROM spine s LEFT JOIN daily
        ON s.user_id = daily.user_id AND s.day_num = daily.day_num
      WINDOW
        w_prev AS (PARTITION BY s.user_id ORDER BY s.day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY s.user_id ORDER BY s.day_num
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, day_num,
           CASE WHEN cents IS NOT NULL THEN cents
                WHEN d_prev IS NOT NULL AND d_next IS NOT NULL THEN
                  CAST((v_prev * (d_next - day_num) + v_next * (day_num - d_prev))
                       // (d_next - d_prev) AS BIGINT)
                ELSE NULL END AS cents_filled,
           CASE WHEN cents IS NOT NULL THEN 'actual'
                WHEN d_prev IS NOT NULL AND d_next IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS src
    FROM j
    """,
)
def ts_interpolate(spark, sf_dir):
    """Linear gap interpolation — the value-filling upgrade of
    agg_gap_fill's zero-fill: each user's missing days take the exact
    integer lerp between neighboring present days,
    (v_prev·(d_next−d) + v_next·(d−d_prev)) div (d_next−d_prev) — all
    non-negative cents, so floor division is engine-uniform and no
    float interpolation formula can drift. Edges (before first / after
    last observation) stay NULL and are tagged 'edge'. One shuffle on
    user_id; the spine is |users|×|days| (activity-horizon-bounded,
    never event-scale)."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    daily = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day_num"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    bounds = daily.agg(F.min("day_num").alias("lo"), F.max("day_num").alias("hi"))
    spine = (
        daily.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day_num"))
    )
    j = spine.join(daily, ["user_id", "day_num"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    present_day = F.when(F.col("cents").isNotNull(), F.col("day_num"))
    j = j.select(
        "user_id",
        "day_num",
        "cents",
        F.last(present_day, ignorenulls=True).over(w_prev).alias("d_prev"),
        F.last("cents", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.first(present_day, ignorenulls=True).over(w_next).alias("d_next"),
        F.first("cents", ignorenulls=True).over(w_next).alias("v_next"),
    )
    interp_ok = F.col("d_prev").isNotNull() & F.col("d_next").isNotNull()
    lerp = F.expr(
        "(v_prev * (d_next - day_num) + v_next * (day_num - d_prev))"
        " div (d_next - d_prev)"
    )
    return j.select(
        "user_id",
        "day_num",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(interp_ok, lerp)
        .alias("cents_filled"),
        F.when(F.col("cents").isNotNull(), F.lit("actual"))
        .when(interp_ok, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("src"),
    )


@query(
    "ts_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, day_num, cents,
             ROW_NUMBER() OVER w AS t_idx,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY day_num
               ROWS UNBOUNDED PRECEDING) AS run_sum
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_num)),
    base AS (
      SELECT event_type, SUM(cents) AS b FROM idx WHERE t_idx <= 7
      GROUP BY event_type),
    cusum AS (
      SELECT i.event_type, i.day_num,
             abs(7 * i.run_sum - i.t_idx * base.b) AS cusum_abs
      FROM idx i JOIN base USING (event_type))
    SELECT event_type, day_num AS cp_day_num, CAST(cusum_abs AS BIGINT) AS cusum_abs
    FROM cusum
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY cusum_abs DESC, day_num) = 1
    """,
)
def ts_changepoint(spark, sf_dir):
    """CUSUM changepoint detection — the day each series' cumulative
    deviation from its first-week baseline peaks (level-shift
    localization for monitoring, the pinpointing complement of
    dq_volume_anomaly's flagging). Fraction-free: with baseline mean
    B/7, the statistic |Σ_{d≤t} x_d − t·B/7| is scaled by 7 to
    |7·run_sum − t·B| — pure int64, exact at any merge order; argmax
    ties break to the earliest day."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day_num"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day_num")
    idx = daily.select(
        "event_type",
        "day_num",
        "cents",
        F.row_number().over(w).alias("t_idx"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_sum"),
    )
    base = (
        idx.where(F.col("t_idx") <= 7)
        .groupBy("event_type")
        .agg(F.sum("cents").alias("b"))
    )
    cusum = idx.join(F.broadcast(base), "event_type").select(
        "event_type",
        "day_num",
        F.abs(F.lit(7) * F.col("run_sum") - F.col("t_idx") * F.col("b")).alias(
            "cusum_abs"
        ),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("cusum_abs").desc(), "day_num"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("day_num").alias("cp_day_num"), "cusum_abs")
    )
