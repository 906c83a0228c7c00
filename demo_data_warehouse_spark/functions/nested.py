"""Python-repr nested-cell parsing (SURVEY §2.8 F2-F5, §7.3 item 1).

Lark cells land as *stringified Python literals* — ``"[{'id': 'ou_x',
'name': 'A'}]"``, ``"{'id': 'ou_x'}"``, ``"['tag1', 'tag2']"`` —
because the ingestion wrote ``str(json-ish)`` through pandas to_csv
(reference dags/utils/etl.py:285-296, dags/utils/common/data_helper.py:109-122).

Strategy (scale posture: keep the hot path JVM-side):
  fast path   regexp quote-normalization + from_json — pure Catalyst,
              vectorized, handles every cell without embedded apostrophes
  fallback    Arrow-batched pandas UDF running ast.literal_eval, applied
              ONLY to rows the fast path failed to parse (per-row WHEN
              guard) — pathological apostrophe-bearing names etc.
"""

from __future__ import annotations

import ast
import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


_UDF_CACHE: dict = {}


def _pyrepr_to_json_udf(col: Column) -> Column:
    # pandas_udf registration needs an active session → create lazily.
    # The whole closure is self-contained (local imports, no module-level
    # references) so cloudpickle ships it by value and Python workers
    # don't need this package importable.
    if "u" not in _UDF_CACHE:

        @pandas_udf("string")
        def u(s: pd.Series) -> pd.Series:
            import ast as _ast
            import json as _json

            def conv(v):
                if v is None or not isinstance(v, str):
                    return None
                try:
                    return _json.dumps(_ast.literal_eval(v))
                except (ValueError, SyntaxError):
                    return None

            return s.map(conv)

        _UDF_CACHE["u"] = u
    return _UDF_CACHE["u"](col)


def _normalize_quotes(col: Column) -> Column:
    # 'key': 'it''s' style cells break here — that's what the fallback is for
    return F.regexp_replace(col, "'", '"')


def parse_pyrepr(col: Column, schema: str) -> Column:
    """Parse a Python-repr cell into `schema` (a DDL type string like
    "array<struct<id:string,name:string>>"), fast path + UDF fallback.

    The value is parsed through an array-wrapped schema ("[" || s || "]"
    against array<schema>) because from_json with a STRUCT root yields an
    all-null struct on malformed input (PERMISSIVE mode) — the wrap makes
    every failure observable as NULL so the fallback guard can fire.
    """

    def wrapped(s: Column) -> Column:
        arr = F.from_json(F.concat(F.lit("["), s, F.lit("]")), f"array<{schema}>")
        return arr.getItem(0)

    fast = wrapped(_normalize_quotes(col))
    slow = wrapped(_pyrepr_to_json_udf(col))
    return F.when(fast.isNull() & col.isNotNull(), slow).otherwise(fast)


PERSON_SCHEMA = "array<struct<id:string,name:string>>"
TEXT_SCHEMA = "array<struct<text:string>>"
STRLIST_SCHEMA = "array<string>"
DICT_PERSON_SCHEMA = "struct<id:string,name:string>"


def person_id(col: Column) -> Column:
    """F3: element-0 'id' from a person-list cell (reference etl.py:287-288)."""
    return parse_pyrepr(col, PERSON_SCHEMA).getItem(0).getField("id")


def person_name(col: Column) -> Column:
    return parse_pyrepr(col, PERSON_SCHEMA).getItem(0).getField("name")


def text_value(col: Column) -> Column:
    """F3: element-0 'text' from a text-list cell (reference etl.py:490-495)."""
    return parse_pyrepr(col, TEXT_SCHEMA).getItem(0).getField("text")


def list_head(col: Column) -> Column:
    """F5: first element of a list-of-strings cell (reference etl.py:496-499)."""
    return F.element_at(parse_pyrepr(col, STRLIST_SCHEMA), 1)


def string_list(col: Column) -> Column:
    """department_ids → ARRAY<STRING> (reference etl.py:295-296)."""
    return parse_pyrepr(col, STRLIST_SCHEMA)


def dict_id(col: Column) -> Column:
    """F4: 'id' from a dict cell (reference etl.py:502-503)."""
    return parse_pyrepr(col, DICT_PERSON_SCHEMA).getField("id")


def dict_name(col: Column) -> Column:
    return parse_pyrepr(col, DICT_PERSON_SCHEMA).getField("name")


def messy_numeric(col: Column) -> Column:
    """F7: defensive numeric coercion (reference data_helper.py:109-122).

    str → literal_eval; list → first element; dict → .get('text', 0);
    non-numeric → 0; null → 0. Expressed as a coalesce chain of native
    try-casts + pyrepr parses, no UDF on the common shapes.
    """
    # try_cast returns null instead of raising under ANSI mode
    as_double = col.try_cast("double")
    text_list = text_value(col).try_cast("double")
    plain_list = F.element_at(parse_pyrepr(col, "array<double>"), 1)
    dict_text = parse_pyrepr(col, "struct<text:double>").getField("text")
    return F.coalesce(as_double, text_list, plain_list, dict_text, F.lit(0.0))
