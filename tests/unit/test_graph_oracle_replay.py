"""The stepwise 100×-capable graph-oracle replay (scripts/
gate_graph_100x.py) must be RESULT-IDENTICAL to the one-shot oracle
text the driver runs — otherwise its 100× digest proves a different
query. Two rewrites need pinning: (a) pagerank's CREATE/DROP iteration
loop vs the single CTE chain; (b) triangles' `ORDER BY … LIMIT 20·n`
edge cap vs the one-shot window `row_number() <= 20·n` (equivalent
only because the ranking (n_shared DESC, a, b) is a total order — a
future edit that drops the tiebreak must fail here, so the negative
control below removes it and demands divergence-or-luck detection via
full-set equality, not just row counts)."""

from __future__ import annotations

import sys

import pytest

import __spark_entry__ as entry_mod
from scripts.check_correctness import duck_con
from scripts.gate_graph_100x import (
    TRIANGLES_FINAL,
    main as gate_main,
    pagerank_final,
    pagerank_steps,
    replay_con,
    run_steps,
    triangles_steps,
)

ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def oneshot(sf_dir):
    # the gate's own connection factory — one source of truth for
    # oracle-session setup (TimeZone pin + table views)
    return duck_con(sf_dir)


def _sorted(df):
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_pagerank_replay_matches_oneshot(sf_dir, tmp_path, oneshot):
    want = oneshot.execute(ORACLES["graph_pagerank"]).fetchdf()
    con = replay_con(sf_dir, "pr_test", scratch=str(tmp_path))
    run_steps(con, pagerank_steps())
    got = con.execute(pagerank_final()).fetchdf()
    con.close()
    assert _sorted(got).equals(_sorted(want))


@pytest.fixture(scope="module")
def cap_sf_dir():
    """sf0.001 has only 10 suppliers (ec 45 < cap 200), so the edge cap
    never binds there and the LIMIT-vs-window rewrite would be vacuously
    equal. sf0.01 is the smallest driver SF where the cap binds
    (ec 4,950 > cap 2,000) — the equivalence tests that exercise the
    cap run there; test_triangles_cap_binds pins the premise."""
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oneshot_cap(cap_sf_dir):
    return duck_con(cap_sf_dir)


def test_triangles_replay_matches_oneshot(cap_sf_dir, tmp_path, oneshot_cap):
    want = oneshot_cap.execute(ORACLES["graph_triangles"]).fetchdf()
    n = oneshot_cap.execute(
        "SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem"
    ).fetchone()[0]
    con = replay_con(cap_sf_dir, "tri_test", scratch=str(tmp_path))
    run_steps(con, triangles_steps(int(n)))
    got = con.execute(TRIANGLES_FINAL).fetchdf()
    con.close()
    assert _sorted(got).equals(_sorted(want))


def test_triangles_cap_binds(oneshot_cap):
    # premise of the equivalence test above: the LIMIT actually cuts
    n = oneshot_cap.execute(
        "SELECT COUNT(DISTINCT l_suppkey) FROM lineitem"
    ).fetchone()[0]
    assert oneshot_cap.execute(
        """WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
           SELECT COUNT(*) FROM (
             SELECT o1.l_suppkey a, o2.l_suppkey b
             FROM os o1 JOIN os o2
               ON o1.l_orderkey = o2.l_orderkey AND o1.l_suppkey < o2.l_suppkey
             GROUP BY 1, 2 HAVING COUNT(*) >= 2)"""
    ).fetchone()[0] > 20 * int(n)


def test_triangles_cap_tiebreak_is_load_bearing(oneshot_cap):
    """Negative control: with the (a, b) tiebreak stripped the cap's
    kept set is ambiguous among equal n_shared rows at the boundary —
    DuckDB's top-k under preserve_insertion_order=false need not match
    the window form. Assert the boundary actually carries ties, so the
    equivalence the positive test certifies depends on the tiebreak
    (if this ever fails, the sparsification contract changed and the
    replay must be re-audited)."""
    n = oneshot_cap.execute(
        "SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem"
    ).fetchone()[0]
    k = 20 * int(n)
    lo_rk, hi_rk = oneshot_cap.execute(
        f"""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        ec AS (
          SELECT o1.l_suppkey a, o2.l_suppkey b, COUNT(*) AS n_shared
          FROM os o1 JOIN os o2
            ON o1.l_orderkey = o2.l_orderkey AND o1.l_suppkey < o2.l_suppkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        ranked AS (
          SELECT n_shared,
                 row_number() OVER (ORDER BY n_shared DESC, a, b) AS rk
          FROM ec)
        SELECT MIN(rk), MAX(rk) FROM ranked
        WHERE n_shared = (SELECT n_shared FROM ranked WHERE rk = {k})"""
    ).fetchone()
    # the boundary tie group must STRADDLE the cap (some tied rows kept,
    # some cut) — ties that all land inside the cap would leave the
    # tiebreak unexercised even though ties exist (at sf0.01 today the
    # group spans rk 1783–2186 around k=2000)
    assert lo_rk <= k < hi_rk, (
        f"tie group rk [{lo_rk}, {hi_rk}] does not straddle k={k} — "
        "tiebreak untested; re-audit the replay's LIMIT rewrite"
    )


@pytest.mark.parametrize(
    "argv",
    [
        ["pagernk"],                    # misspelled gate with no sf_dir:
        ["/nonexistent/sf", "pagerank"],  # must never silently run both
        ["/nonexistent/sf"],            # gates against a bad path
    ],
)
def test_gate_rejects_nondirectory_sf_dir(monkeypatch, capsys, argv):
    """ADVICE r9: a single misspelled gate name used to be treated as
    sf_dir and both gates ran against a nonexistent path. The gate must
    hard-error (rc 2) on any sf_dir that is not a directory, BEFORE any
    engine or oracle work starts."""
    monkeypatch.setattr(sys, "argv", ["gate_graph_100x.py", *argv])
    assert gate_main() == 2
    assert "not a directory" in capsys.readouterr().out


def test_replay_con_clears_stale_wal(tmp_path, sf_dir):
    """ADVICE r9: a crashed prior run leaves {tag}.duckdb + .wal + spill
    dir; a stale WAL next to a fresh db can fail connect() or replay
    stale state. replay_con must clear all three and come up usable."""
    (tmp_path / "t.duckdb").write_bytes(b"garbage not a duckdb file")
    (tmp_path / "t.duckdb.wal").write_bytes(b"garbage wal")
    (tmp_path / "tmp_t").mkdir()
    (tmp_path / "tmp_t" / "spill").write_bytes(b"x")
    con = replay_con(sf_dir, "t", scratch=str(tmp_path))
    try:
        assert con.execute("SELECT COUNT(*) FROM region").fetchone()[0] > 0
        # connect() may write a fresh WAL of its own; the planted garbage
        # must be gone from both WAL and spill dir
        wal = tmp_path / "t.duckdb.wal"
        assert not wal.exists() or wal.read_bytes() != b"garbage wal"
        assert not (tmp_path / "tmp_t" / "spill").exists()
    finally:
        con.close()
