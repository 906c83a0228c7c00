"""100×-capable oracle replay for the two graph queries (VERDICT r8 item 6).

`graph_pagerank` / `graph_triangles` are the only registry rows whose
DuckDB oracle never ran at the 100× twin: their single-statement CTE
chains keep every intermediate alive at once and exceed this box's
~76 GB free disk in temp spill (GATE100X_WIN_r08 / GATE100X_R9PREP_r08
measured the ceiling; the Spark engine side completes 100× in
37.5 s / 228 s). This script replays each oracle STEPWISE on a
disk-backed DuckDB database — every CTE becomes a real table, dropped
(and checkpointed) the moment its last consumer finishes — so peak
footprint is one materialized stage, not the whole chain. Two
result-identical rewrites make the replay cheap, both pinned by unit
equivalence tests against the one-shot oracle text at sf0.001
(tests/unit/test_graph_oracle_replay.py):

- pagerank: the iteration becomes a loop of CREATE TABLE pr{i+1} /
  DROP TABLE pr{i} — same SQL per step, so results are byte-identical.
- triangles: the edge cap `row_number() OVER (ORDER BY n_shared DESC,
  a, b) <= 20·n` becomes `ORDER BY n_shared DESC, a, b LIMIT 20·n` —
  the ranking is a TOTAL order (a, b ties it), so the kept set is
  identical, but DuckDB executes a top-k heap instead of a full
  window sort over the 100× co-occurrence table.

The Spark side runs the registered query unchanged and the final
compare is the gate's own engine-side digest (check_correctness.
digest_compare) — nothing leaves either engine but (count, digest).

Usage: python scripts/gate_graph_100x.py [sf_dir] [pagerank|triangles ...]
       (default sf_dir /tmp/ddw_scaled_sf100, both gates)

When more than one gate is requested, each runs in its OWN subprocess:
two 100× engine jobs sequentially in one shared JVM OOM the default 8 GB
driver heap on the second (measured r9 — GATE100X_GRAPH_r09.txt run 1),
and a fresh process per gate is the only isolation that needs no tuning.
The engine heap itself defaults to DDW_DRIVER_MEMORY=48g here (override
via the env var) — sized for the 100× twin on this 128 GB box.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from demo_data_warehouse_spark.catalog import TABLES  # noqa: E402
from demo_data_warehouse_spark.session import get_spark  # noqa: E402
from scripts.check_correctness import digest_compare  # noqa: E402

SCRATCH = "/tmp/ddw_graph_oracle"

# Must stay in lockstep with relational_ext._pagerank_oracle's defaults —
# test_pagerank_replay_matches_oneshot pins the equivalence mechanically.
PR_N_ITER = 3
PR_SCALE = 1_000_000


def pagerank_steps(n_iter: int = PR_N_ITER, scale: int = PR_SCALE) -> list[str]:
    """The _pagerank_oracle CTE chain as an ordered statement list; the
    SELECT text per stage is copied verbatim from the one-shot form."""
    base = scale - scale * 85 // 100
    steps = [
        """CREATE TABLE pairs AS
           SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS c_id,
                           's:' || CAST(l.l_suppkey AS VARCHAR) AS s_id
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey""",
        """CREATE TABLE edges AS
           SELECT c_id AS src, s_id AS dst FROM pairs
           UNION ALL
           SELECT s_id AS src, c_id AS dst FROM pairs""",
        "DROP TABLE pairs",
        "CREATE TABLE nodes AS SELECT DISTINCT src AS id FROM edges",
        """CREATE TABLE deg AS
           SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY src""",
        f"CREATE TABLE pr0 AS SELECT id, CAST({scale} AS BIGINT) AS pr FROM nodes",
    ]
    for i in range(n_iter):
        steps += [
            f"""CREATE TABLE pr{i + 1} AS
                SELECT n.id, {base} + (COALESCE(agg.s, 0) * 85) // 100 AS pr
                FROM nodes n LEFT JOIN (
                  SELECT e.dst AS id, SUM(p.pr // d.deg) AS s
                  FROM edges e
                  JOIN pr{i} p ON p.id = e.src
                  JOIN deg d ON d.src = e.src
                  GROUP BY e.dst
                ) agg ON agg.id = n.id""",
            f"DROP TABLE pr{i}",
        ]
    return steps


def pagerank_final(n_iter: int = PR_N_ITER) -> str:
    return f"SELECT id, CAST(pr AS BIGINT) AS pr FROM pr{n_iter}"


def triangles_steps(n_vertices: int) -> list[str]:
    """The graph_triangles oracle as an ordered statement list. The edge
    cap uses ORDER BY … LIMIT (top-k) in place of the one-shot window's
    row_number() <= 20·n — identical kept set under the total order
    (n_shared DESC, a, b)."""
    return [
        "CREATE TABLE os AS SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem",
        """CREATE TABLE ec AS
           SELECT o1.l_suppkey AS a, o2.l_suppkey AS b,
                  CAST(COUNT(*) AS BIGINT) AS n_shared
           FROM os o1 JOIN os o2
             ON o1.l_orderkey = o2.l_orderkey AND o1.l_suppkey < o2.l_suppkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 2""",
        "DROP TABLE os",
        f"""CREATE TABLE e AS
            SELECT a, b FROM ec
            ORDER BY n_shared DESC, a, b LIMIT {20 * n_vertices}""",
        "DROP TABLE ec",
        """CREATE TABLE tri AS
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1
           JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
           JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""",
    ]


TRIANGLES_FINAL = """
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
    GROUP BY node
"""


def replay_con(
    sf_dir: str, tag: str, scratch: str = SCRATCH
) -> duckdb.DuckDBPyConnection:
    """Disk-backed connection: intermediates live in the db file (space
    reclaimed on DROP + CHECKPOINT), spill goes to an explicit temp dir,
    and insertion-order preservation is off (no ordering contract exists
    between materialized stages — final compare is order-insensitive)."""
    os.makedirs(scratch, exist_ok=True)
    db = os.path.join(scratch, f"{tag}.duckdb")
    # a crashed prior run can leave a stale db, its WAL sibling, and a
    # spill dir — a stale WAL next to a fresh db file makes connect()
    # fail or replay stale state, so clear all three
    for stale in (db, db + ".wal"):
        if os.path.exists(stale):
            os.remove(stale)
    shutil.rmtree(os.path.join(scratch, f"tmp_{tag}"), ignore_errors=True)
    con = duckdb.connect(db)
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET temp_directory='{scratch}/tmp_{tag}'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_steps(con: duckdb.DuckDBPyConnection, steps: list[str]) -> None:
    for s in steps:
        t0 = time.time()
        con.execute(s)
        if s.startswith("DROP"):
            con.execute("CHECKPOINT")  # reclaim the dropped stage's blocks
        head = " ".join(s.split())[:72]
        print(f"    [{time.time() - t0:7.1f}s] {head}", flush=True)


GATES = ("pagerank", "triangles")


def _gate_plan(con: duckdb.DuckDBPyConnection, gate: str):
    """(query_name, steps, final_select) for one gate — the only
    per-gate differences in the replay loop."""
    if gate == "pagerank":
        return "graph_pagerank", pagerank_steps(), pagerank_final()
    n = con.execute(
        "SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem"
    ).fetchone()[0]
    return "graph_triangles", triangles_steps(int(n)), TRIANGLES_FINAL


def main() -> int:
    args = sys.argv[1:]
    which = [a for a in args if a in GATES]
    rest = [a for a in args if a not in GATES]
    if len(rest) > 1:
        # an unknown gate name must be a hard error, never a silent
        # skip — a typo'd invocation printing ALL GREEN with zero gates
        # run would be a false-green verification artifact
        print(f"unknown gate name(s): {rest[1:]} (gates: {GATES})")
        return 2
    sf_dir = rest[0] if rest else "/tmp/ddw_scaled_sf100"
    if not os.path.isdir(sf_dir):
        # catches the single-misspelled-gate form too (`… pagernk` would
        # otherwise be silently treated as sf_dir and run both gates
        # against a nonexistent path)
        print(f"sf_dir is not a directory: {sf_dir!r} (gates: {GATES})")
        return 2
    which = which or list(GATES)

    if len(which) > 1:
        # one subprocess per gate: a fresh JVM heap per engine job (see
        # module docstring — the shared-heap form OOMs at 100×)
        import subprocess

        rc = 0
        for g in which:
            rc |= subprocess.call(
                [sys.executable, os.path.abspath(__file__), sf_dir, g]
            )
        print("FAILURES above" if rc else "ALL GREEN (all gates, per-process)",
              flush=True)
        return 1 if rc else 0

    os.environ.setdefault("DDW_DRIVER_MEMORY", "48g")
    spark = get_spark("ddw-graph-100x")
    qs = entry_mod.queries()
    failures = 0

    for gate in which:
        t0 = time.time()
        con = replay_con(sf_dir, gate)
        name, steps, final = _gate_plan(con, gate)
        print(f"{name} @ {sf_dir}", flush=True)
        sdf = qs[name](spark, sf_dir)
        run_steps(con, steps)
        problems = digest_compare(sdf, con, final)
        con.close()
        status = "FAIL " + "; ".join(problems) if problems else "ok    digest match"
        failures += bool(problems)
        print(f"  {status}  ({time.time() - t0:.1f}s total)", flush=True)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    print("FAILURES: %d" % failures if failures else "ALL GREEN", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
