"""Distributed training-step primitives — the point where a curated
corpus stops being "data" and starts being a model. The reference
engine stops at query/serve (fabrix-core exposes no trainer); this
module adds the one training shape that IS a distributed-query
workload: full-batch gradient descent, where each iteration is a
single aggregate pass over the corpus and the parameter vector is
driver-held metadata (the same driver-loop contract as
``similarity.power_iteration_top`` and ``text.bpe_train``).

Cross-engine exactness is the design constraint, met the repo's usual
way: NO transcendental in the update path. The logistic link is the
rational "fast sigmoid" σ̃(z) = 1/2 + z / (2·(1+|z|)) (an established
cheap sigmoid substitute — same range, sign, and monotonicity), which
in integer micro-units is one truncating division:
``p_micro = 500000 + (z·500000) DIV (10⁶ + |z|)`` — DIV truncates
toward zero identically in Spark and DuckDB (verified on negatives),
so every engine replaying the same iterations reproduces the weight
sequence bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_gd"]


def _div_trunc(a: int, b: int) -> int:
    """Integer division truncating toward zero — SQL DIV / DuckDB //
    semantics (Python's // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def logreg_gd(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iters: int = 3,
    lr_num: int = 1,
    lr_den: int = 2,
) -> DataFrame:
    """Full-batch gradient descent for a logistic-style linear
    classifier, distributed the only way that survives 100 TB: the
    CORPUS never moves (each iteration is ONE aggregate with map-side
    partials — dim gradient sums and nothing else), and the WEIGHTS
    are plan-literal metadata refreshed on the driver between passes.
    Returns the full weight trajectory: one row per (iteration, j)
    with the integer micro-unit weight — dim·iters rows, metadata by
    contract.

    Exact integer arithmetic end to end:

    - ``features`` must be INTEGER expressions (quantize upstream —
      milli-units are the convention here); ``label`` must be 0/1.
    - logit ``z = Σ w_j·x_j`` and the link ``p_micro = 500000 +
      (z·500000) DIV (10⁶+|z|)`` evaluate in decimal(38,0), so a
      large-|z| corpus cannot wrap silently (the gram_matrix lesson,
      applied from day one); the link value itself is < 10⁶ and drops
      back to int64.
    - residual ``r = p_micro − y·10⁶``; gradient sums
      ``g_j = Σ x_j·r`` aggregate as decimal(38,0) (≤ |x|·10⁶/row).
    - update ``w_j ← w_j − trunc_div(g_j·lr_num, n·lr_den)`` in exact
      Python ints with truncation-toward-zero (SQL DIV semantics), so
      a SQL oracle unrolling the same iterations matches bit for bit.

    Full-batch (not stochastic) is deliberate: SGD's sequential
    sampling is a single-node loop, while the batch gradient is a
    pure mergeable aggregate — the textbook distributed shape (one
    shuffle-free pass per iteration; at scale, persist the
    featurized projection once to skip re-deriving features each
    pass). Rows with a NULL label or any NULL feature are excluded
    (they carry no gradient, and one NULL would poison the sums)."""
    dim = len(features)
    if dim == 0:
        raise ValueError("logreg_gd: at least one feature expression required")
    feat = df.select(
        *[c.cast("long").alias(f"__x{j}") for j, c in enumerate(features)],
        label.cast("long").alias("__y"),
    )
    notnull = F.col("__y").isNotNull()
    for j in range(dim):
        notnull = notnull & F.col(f"__x{j}").isNotNull()
    feat = feat.where(notnull)
    n = feat.count()
    if n == 0:
        raise ValueError("logreg_gd: empty training set after NULL exclusion")
    w = [0] * dim
    rows: list[tuple[int, int, int]] = []
    for it in range(1, iters + 1):
        z = None
        for j in range(dim):
            term = F.lit(int(w[j])).cast("decimal(38,0)") * F.col(f"__x{j}")
            z = term if z is None else z + term
        scored = feat.withColumn("__z", z.cast("decimal(38,0)")).selectExpr(
            "*",
            "CAST(500000 + (__z * 500000) DIV"
            " (CAST(1000000 AS DECIMAL(38,0)) + abs(__z)) AS BIGINT) AS __p",
        )
        r = F.col("__p") - F.col("__y") * F.lit(1_000_000)
        g = scored.agg(
            *[
                F.sum((F.col(f"__x{j}") * r).cast("decimal(38,0)")).alias(
                    f"__g{j}"
                )
                for j in range(dim)
            ]
        ).collect()[0]
        for j in range(dim):
            w[j] = w[j] - _div_trunc(int(g[f"__g{j}"]) * lr_num, n * lr_den)
            rows.append((it, j, int(w[j])))
    return df.sparkSession.createDataFrame(
        rows, "iteration int, j int, w long"
    )
