"""Property-based test: parse_pyrepr must recover arbitrary name strings
from Python-repr person cells — including apostrophes, double quotes,
backslashes, unicode, and whitespace — exactly as ast.literal_eval does.

One Spark job for the whole example batch (hypothesis drives the data,
not per-example Spark jobs, which would take minutes)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from demo_data_warehouse_spark.functions.nested import PERSON_SCHEMA, parse_pyrepr

# printable-ish text with the characters that break quote normalization
name_st = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz '\"\\,:{}[]éğ中")
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(name_st, min_size=1, max_size=8))
def test_person_cells_roundtrip(spark, names):
    cells = [(i, str([{"id": f"ou_{i}", "name": n}])) for i, n in enumerate(names)]
    df = spark.createDataFrame(cells, "i int, cell string")
    out = (
        df.select(
            "i",
            parse_pyrepr(F.col("cell"), PERSON_SCHEMA).getItem(0).getField("name").alias("name"),
        )
        .toPandas()
        .sort_values("i")
    )
    assert list(out.name) == names
