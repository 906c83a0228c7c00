"""Property-based tests for the exact time-series operators: EWMA and
interpolated percentiles against plain-Python reference computations
(SURVEY §5 leg B)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_data_warehouse_spark.queries.timeseries import _EWMA_K, _EWMA_W

series_st = st.lists(
    st.integers(min_value=0, max_value=50_000),  # value cents
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(series_st)
def test_ewma_matches_python_reference(spark, cents_series):
    # the registered query's window expression vs a direct Python loop
    # over the same integer weights — including the early-row
    # renormalization, where an off-by-one in the tap indexing would
    # show first
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, c) for i, c in enumerate(cents_series)]
    df = spark.createDataFrame(rows, "seq bigint, v_c bigint")
    w = Window.orderBy("seq")
    lags = [F.lag("v_c", j).over(w) for j in range(_EWMA_K)]
    num = sum(
        (
            F.when(lag.isNotNull(), lag * F.lit(wt)).otherwise(F.lit(0))
            for lag, wt in zip(lags, _EWMA_W)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
            for lag, wt in zip(lags, _EWMA_W)
        ),
        start=F.lit(0),
    )
    got = {
        r["seq"]: r["ewma"]
        for r in df.select(
            "seq", (num.cast("double") / den.cast("double")).alias("ewma")
        ).collect()
    }
    for t in range(len(cents_series)):
        n = d = 0
        for j, wt in enumerate(_EWMA_W):
            if t - j >= 0:
                n += cents_series[t - j] * wt
                d += wt
        assert got[t] == n / d, (t, cents_series)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=30
    )
)
def test_percentile_cont_matches_numpy_linear(spark, cents_series):
    # the quarter-cent integer interpolation must equal numpy's
    # 'linear' percentile (the percentile_cont definition) exactly
    # when both are expressed in quarter-cent units
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, c) for i, c in enumerate(cents_series)]
    df = spark.createDataFrame(rows, "event_id bigint, v_c bigint")
    wv = Window.orderBy("v_c", "event_id")
    c = df.withColumns(
        {"rk": F.row_number().over(wv), "n": F.count("*").over(Window.partitionBy())}
    )
    n1 = F.col("n") - 1

    def pick(pos):
        return F.min(F.when(F.col("rk") == pos, F.col("v_c")))

    sel = c.groupBy("n").agg(
        pick((n1 / 4).cast("bigint") + 1).alias("lo"),
        pick((n1 / 4).cast("bigint") + 2).alias("hi"),
    )
    rem = (F.col("n") - 1) % 4
    got = sel.select(
        (F.col("lo") * (4 - rem) + F.coalesce("hi", "lo") * rem).alias("p25_u")
    ).head()["p25_u"]
    want = round(float(np.percentile(np.array(cents_series, dtype=np.float64), 25)) * 4)
    assert got == want, (cents_series, got, want)
