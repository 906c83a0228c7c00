"""Planted-defect control for the volume-sweep harness (VERDICT r9 item 5).

The 10x/30x/100x sweeps (GATE10X/GATE30X/GATE100X_* — all produced by
scripts/check_correctness.main over a scaled twin) have been fully clean
since round 8. A gate that never fails is indistinguishable from a gate
that CANNOT fail, so — mirroring the positive/negative-control discipline
of the TZ-pin and triangles-tiebreak tests — this plants a defect and
demands red: a twin of sf0.001 with exactly ONE parquet value corrupted
(one lineitem row's l_quantity bumped by +1), fed to main() with the
Spark side on the tampered twin and the oracle side pinned to pristine
data. Both sweep modes must report the plant:

- collect-compare mode (the GATE10X/GATE30X form) through the real
  registry's agg_group, whose sum_qty absorbs the bumped value;
- --digest mode (the GATE100X large-output form) through a minimal
  bigint projection that carries the bumped cell into the row digest.

Positive controls run first: the SAME tampered twin wired the sweeps'
normal way (both engines on one dir) stays green in both modes, proving
the red comes from the planted single-value divergence, not from the
tamper breaking the read path.
"""

from __future__ import annotations

import shutil
import sys
import types

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.catalog import TABLES
from scripts import check_correctness as cc
from scripts.check_correctness import duck_con as real_duck_con

PRISTINE = "/root/testdata/sf0.001"
PROG = "check_correctness.py"


@pytest.fixture(scope="module")
def tampered_dir(tmp_path_factory):
    """sf0.001 twin with one l_quantity value bumped by +1.0 — the victim
    row is the first (file-order) lineitem row inside agg_group's
    l_shipdate <= 2000-01-01 predicate, so the plant is guaranteed to
    reach that query's aggregate and not be filtered away."""
    out = tmp_path_factory.mktemp("plant_sf")
    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{PRISTINE}/{t}.parquet", out / f"{t}.parquet")
    tbl = pq.read_table(f"{PRISTINE}/lineitem.parquet")
    ship = tbl.column("l_shipdate").to_pandas()
    cutoff = pd.Timestamp("2000-01-01")
    if ship.dt.tz is not None:
        cutoff = cutoff.tz_localize(ship.dt.tz)
    eligible = ship.index[ship <= cutoff]
    assert len(eligible) > 0, "no lineitem row passes agg_group's filter"
    victim = int(eligible[0])
    idx = tbl.schema.get_field_index("l_quantity")
    qty = tbl.column(idx).to_pylist()
    qty[victim] += 1.0
    field = tbl.schema.field(idx)
    tbl = tbl.set_column(idx, field, pa.array(qty, type=field.type))
    pq.write_table(tbl, out / "lineitem.parquet")
    return str(out)


def _run_main(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", [PROG, *argv])
    return cc.main()


def test_positive_control_collect_path_green(monkeypatch, capsys, spark, tampered_dir):
    # the sweeps' normal wiring: both engines read the tampered twin —
    # the tamper itself must be invisible to a same-dir compare
    rc = _run_main(monkeypatch, [tampered_dir, "agg_group"])
    out = capsys.readouterr().out
    assert rc == 0 and "ok    agg_group" in out, out


def test_planted_defect_collect_path_red(monkeypatch, capsys, spark, tampered_dir):
    # oracle pinned to pristine data → the one bumped cell is a real
    # engine-vs-oracle divergence and the sweep entrypoint must go red
    monkeypatch.setattr(cc, "duck_con", lambda _sf: real_duck_con(PRISTINE))
    rc = _run_main(monkeypatch, [tampered_dir, "agg_group"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL  agg_group" in out, out
    assert "mismatch" in out, out


def _qty_query(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
    )


_QTY_ORACLE = (
    "SELECT l_orderkey, l_linenumber, "
    "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c FROM lineitem"
)

_STUB = types.SimpleNamespace(
    queries=lambda: {"plant_qty": _qty_query},
    oracle_sql=lambda: {"plant_qty": _QTY_ORACLE},
)


def test_positive_control_digest_path_green(monkeypatch, capsys, spark, tampered_dir):
    monkeypatch.setattr(cc, "entry_mod", _STUB)
    rc = _run_main(monkeypatch, ["--digest", tampered_dir, "plant_qty"])
    out = capsys.readouterr().out
    assert rc == 0 and "digest match" in out, out


def test_planted_defect_digest_path_red(monkeypatch, capsys, spark, tampered_dir):
    # the GATE100X large-output form: nothing leaves either engine but
    # (count, digest) — the single bumped cell must still flip the digest
    monkeypatch.setattr(cc, "entry_mod", _STUB)
    monkeypatch.setattr(cc, "duck_con", lambda _sf: real_duck_con(PRISTINE))
    rc = _run_main(monkeypatch, ["--digest", tampered_dir, "plant_qty"])
    out = capsys.readouterr().out
    assert rc == 1 and "digest differs" in out, out
