"""Generate an N×-scaled twin of a testdata SF directory for scale-law
measurement (scripts/scale_check.py).

NOT a correctness input — the driver's /root/testdata stays the only
source of truth for oracles. This builds a larger dataset with the same
shape so we can MEASURE how each operator family's wall time grows with
data volume (the 100 TB question plans alone can't answer):

- events / orders / lineitem / customer / supplier / part: replicated
  with per-copy key offsets (FKs shifted consistently, so joins keep
  their selectivity and per-key group sizes stay constant — pure volume
  growth, the "more days of traffic" regime).
- documents: replicated with a per-copy suffix token — replicas become
  NEAR-duplicates (crawl-growth regime), deliberately stressing the
  dedup/LSH bucket paths with growing duplicate-cluster sizes.
- embeddings: replicated with a small deterministic per-copy
  perturbation on one dimension — near-dup vectors that stress the ANN
  bucket paths the same way.
- region / nation: dimensions, kept as-is.

Usage: python scripts/make_scaled_sf.py [factor] [out_dir] [files_per_table]
       (defaults: 10, /tmp/ddw_scaled_sf<factor>, 1)

files_per_table=1 reproduces the driver's exact single-file layout
(streams glob the exact file name — required for the stream queries);
files_per_table>1 writes each table as a DIRECTORY of that many part
files, the realistic lake layout, to MEASURE how much of a single-file
ratio is scan-parallelism ceiling rather than plan behavior (batch
queries only — spark.read.parquet takes the directory transparently).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import shutil

from pyspark.sql import functions as F

from demo_data_warehouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


FILES_PER_TABLE = 1


def write_single_file(df, out_dir: str, name: str) -> None:
    """Write `df` as ONE parquet FILE at {out_dir}/{name}.parquet —
    the driver testdata layout (streams glob the exact file name via
    pathGlobFilter, so a directory-per-table twin breaks them) — or,
    with FILES_PER_TABLE > 1, as a directory of that many part files
    (the realistic lake layout, for layout-vs-plan A/B measurement)."""
    if FILES_PER_TABLE > 1:
        dest = os.path.join(out_dir, f"{name}.parquet")
        df.repartition(FILES_PER_TABLE).write.mode("overwrite").parquet(dest)
        return
    tmp = os.path.join(out_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(out_dir, f"{name}.parquet")
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    elif os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)

KEY_OFFSETS = {
    # table -> columns shifted by copy * stride (stride >> any real key)
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey", "c_nationkey__keep"],  # nationkey stays (dim FK)
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
STRIDE = 100_000_000


def main() -> None:
    global FILES_PER_TABLE
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ddw_scaled_sf{factor}"
    if len(sys.argv) > 3:
        FILES_PER_TABLE = int(sys.argv[3])
    spark = get_spark("ddw-scale-gen")

    def copies(df, build_copy):
        parts = [build_copy(df, c) for c in range(factor)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    for t in ("region", "nation"):
        write_single_file(spark.read.parquet(f"{SRC}/{t}.parquet"), out, t)

    for t, keys in KEY_OFFSETS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        shift = [k for k in keys if not k.endswith("__keep")]

        def one(df, c, shift=shift):
            out_df = df
            for k in shift:
                out_df = out_df.withColumn(k, F.col(k) + F.lit(c * STRIDE))
            return out_df

        write_single_file(copies(df, one), out, t)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def doc_copy(df, c):
        out_df = df.withColumn("doc_id", F.col("doc_id") + F.lit(c * STRIDE))
        if c == 0:
            return out_df
        # near-dup perturbation: suffix token makes replicas land in the
        # same shingle/minhash buckets without being byte-identical
        return out_df.withColumn(
            "text", F.concat(F.col("text"), F.lit(f" rep{c}"))
        )

    write_single_file(copies(docs, doc_copy), out, "documents")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def emb_copy(df, c):
        out_df = df.withColumn("vec_id", F.col("vec_id") + F.lit(c * STRIDE))
        if c == 0:
            return out_df
        eps = 1.0 + c * 1e-4
        return out_df.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> CASE WHEN i = 0 THEN"
                f" cast(x * {eps!r} as float) ELSE x END)"
            ),
        )

    write_single_file(copies(emb, emb_copy), out, "embeddings")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    print(f"scaled x{factor} dataset at {out}")


if __name__ == "__main__":
    main()
