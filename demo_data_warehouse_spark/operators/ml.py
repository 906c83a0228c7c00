"""Distributed in-engine model fitting (exact fixed-point variants).

The training-data engine occasionally needs to FIT small models inside
the pipeline itself — quality-filter classifiers (fastText-style
filters are logistic regressions over hashed features), calibration
heads, IVF/PQ codebooks. MLlib's float implementations are
merge-order-dependent from the first reduction; these variants pin the
arithmetic so the fitted model is bit-identical under any partitioning
— which is what lets a DuckDB oracle replay the whole training loop.

Companion pieces: operators/similarity.py::kmeans_fixed (unsupervised),
ivf_train_centroids / pca_fit_project (driver-bounded fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tdiv(a: int, b: int) -> int:
    """SQL integer division: truncation toward zero (python // floors)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def logreg_gd_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col,
    dim: int,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact full-batch gradient descent for logistic regression
    (η=0.5), bit-reproducible under any partitioning.

    Determinism contract (micro-unit fixed point, scale=1e6):
      - features x_q = round(v·1e6) as bigint; weights w_q / bias b_q
        held in micro-units, initialized to 0;
      - the margin S = Σ_j w_qj·x_qj is an EXACT int64 sum (headroom:
        |w_q|·|x_q|·d ≲ 10¹⁵);
      - z = S/1e12 + b_q/1e6 and p = σ(z) are per-row scalar doubles
        (no accumulation — engines agree to the ulp; the residual is
        frozen at r = round((p−y)·1e6) before any sum);
      - gradients G_j = Σ r·x_qj and G_b = Σ r are exact int64 sums at
        any merge order;
      - updates w_q ← w_q − tdiv(G_j, 2n·1e6), b_q ← b_q − tdiv(G_b, 2n)
        use TRUNCATED division (toward zero) — the SQL integer-division
        semantic shared by Spark `div` and DuckDB `//`; python `//`
        floors on negatives, so the driver-side fold must not use it.

    Scale: each iteration is one narrow map against broadcast weight
    literals + one map-side-combined aggregation; the driver folds
    exactly d+1 ints per iteration into the next round's literals —
    the same bounded-driver contract as kmeans_fixed. Facts are never
    collected.

    Returns (j, w_micro): j ∈ [0, dim) the weights, j = dim the bias,
    j = dim+1 the training-accuracy numerator (#correct at the final
    weights — sign(z) is a PURE INTEGER comparison S + b_q·1e6 ≥ 0, so
    the accuracy is exact, not float-thresholded).
    """
    q = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, v -> cast(round(cast(v as double) * {scale}) as bigint))"
        ).alias("x"),
        label_col.cast("bigint").alias("y"),
    )
    n = q.count()
    w = [0] * dim
    b = 0

    def margin(weights):
        return F.aggregate(
            F.zip_with(
                F.col("x"),
                F.array(*[F.lit(int(wj)) for wj in weights]),
                lambda a, c: a * c,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    for _ in range(iters):
        z = margin(w) / F.lit(float(scale) ** 2) + F.lit(b) / F.lit(float(scale))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = F.round((p - F.col("y")) * F.lit(float(scale))).cast("bigint")
        grads = (
            q.select(r.alias("r"), "x")
            .agg(
                F.sum("r").alias("gb"),
                *[
                    F.sum(F.col("r") * F.element_at("x", j + 1)).alias(f"g{j}")
                    for j in range(dim)
                ],
            )
            .collect()[0]
        )
        w = [w[j] - _tdiv(int(grads[f"g{j}"]), 2 * n * scale) for j in range(dim)]
        b = b - _tdiv(int(grads["gb"]), 2 * n)

    correct = q.select(
        F.when(
            ((margin(w) + F.lit(b).cast("bigint") * F.lit(scale).cast("bigint")) >= 0)
            == (F.col("y") == 1),
            1,
        )
        .otherwise(0)
        .alias("c")
    ).agg(F.sum("c").alias("n_correct"))
    n_correct = int(correct.collect()[0]["n_correct"])

    spark = df.sparkSession
    rows = [(j, int(w[j])) for j in range(dim)] + [
        (dim, int(b)),
        (dim + 1, n_correct),
    ]
    return spark.createDataFrame(rows, "j bigint, w_micro bigint")
