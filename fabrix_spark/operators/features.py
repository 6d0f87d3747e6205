"""Feature engineering for training pipelines — exact, hash-checkable
transforms of the kind every large-scale ML data pipeline runs before
a trainer sees a row: scaling, equi-depth discretization, and
leave-one-out target encoding (Micci-Barreca, "A Preprocessing Scheme
for High-Cardinality Categorical Attributes", SIGKDD Explorations
2001).

Every transform follows the repo's exact-moment discipline (see
profile.correlation): aggregates stay in integer/decimal space, each
CAST to DOUBLE happens once at a pinned point in an expression tree
mirrored verbatim by the SQL oracle, so results hash-match any ANSI
engine bit for bit. At scale each transform is one metadata-sized
aggregate broadcast back over a map-only scan — no per-row Python,
no unpartitioned windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import global_cumsum

__all__ = ["standardize", "quantile_bins", "target_encode_loo"]


def _join_null_safe(
    left: DataFrame, right: DataFrame, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join on ``keys`` with NULL-safe equality (``eqNullSafe``) —
    NULL group keys match each other instead of silently dropping —
    keeping only the left side's key columns (like ``on=keys``)."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__rk_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[f"__rk_{k}"])
        cond = c if cond is None else cond & c
    return left.join(r, cond, how).drop(*[f"__rk_{k}" for k in keys])


def standardize(
    df: DataFrame,
    col: str,
    out_prefix: str = "",
    by: list[str] | None = None,
) -> DataFrame:
    """Append z-score and min-max scalings of integer column ``col``,
    globally or — with ``by`` — within each group (per-domain /
    per-language normalization, the usual shape before mixing corpora
    into one trainer input).

    Moments are exact int64 sums (one aggregate, map-side partials);
    the stats frame — one row, or group-cardinality-sized with ``by``
    (still metadata next to the data, for any realistic segment
    column) — broadcast-joins back, so the transform is one reduce +
    one map-only pass however wide the table. The sample standard
    deviation comes from the exact integer numerator
    ``n·Σx² − (Σx)²`` — native ``stddev`` accumulates engine-specific
    float partials and can NOT be hash-verified across engines.

    z is NULL when the column is constant (zero variance); minmax is
    NULL when max == min. With ``by``, the stats join is NULL-SAFE on
    the group keys — a plain ``on=by`` equi-join would silently DELETE
    every row whose group key is NULL (NULL never equals NULL), turning
    a column-append transform into a row filter.
    """
    by = by or []
    c = F.col(col)
    aggs = [
        F.count(c).alias("__n"),
        F.sum(c).alias("__s"),
        F.sum(c * c).alias("__ss"),
        F.min(c).alias("__mn"),
        F.max(c).alias("__mx"),
    ]
    if by:
        stats = df.groupBy(*by).agg(*aggs)
        joined = _join_null_safe(df, F.broadcast(stats), by)
    else:
        stats = df.agg(*aggs)
        joined = df.join(F.broadcast(stats))
    n_d = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n_d
    var_num = (
        F.col("__n").cast("double") * F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double")
    )
    # n == 1 makes the variance divisor 0, which under ANSI mode (the
    # Spark 4 default) is TASK-KILLING even for doubles — and the
    # division must sit INSIDE a when() branch gated on n > 1, not
    # merely beside an n > 1 conjunct: subexpression elimination
    # force-evaluates an expression shared between a condition and its
    # branch, so a bare `std > 0` guard still divides by zero. For
    # n <= 1 std is NULL and z stays the documented NULL. ~isnan
    # guards the near-constant huge-value case where double rounding
    # drives the exact-integer numerator slightly negative (sqrt →
    # NaN, which compares GREATER than 0 in Spark's total order).
    std = F.sqrt(F.when(F.col("__n") > 1, var_num / (n_d * (n_d - F.lit(1.0)))))
    z = F.when((std > 0) & ~F.isnan(std), (c.cast("double") - mean) / std)
    rng = (F.col("__mx") - F.col("__mn")).cast("double")
    mm = F.when(
        F.col("__mx") > F.col("__mn"), (c - F.col("__mn")).cast("double") / rng
    )
    return joined.withColumn(f"{out_prefix}z", z).withColumn(
        f"{out_prefix}minmax", mm
    ).drop("__n", "__s", "__ss", "__mn", "__mx")


def quantile_bins(
    df: DataFrame, col: str, k: int, by: list[str] | None = None
) -> DataFrame:
    """Append an exact equi-depth bin id (1..k) for integer column
    ``col``: boundary ``j`` is the value at global rank
    ``ceil(j·n/k)`` (the exact order statistic), and
    ``bin = 1 + Σ_j [x > b_j]`` — so equal values always share a bin
    (unlike NTILE, which splits ties across buckets).

    Shape: one value-grouped count (shuffle on the value), a
    distributed running count over value order (:func:`global_cumsum`
    — range partitions, no single-reducer window), ONE aggregate that
    reduces the cum table to k−1 boundary scalars, then a broadcast of
    that single row over the data scan. Value cardinality only ever
    flows through the cumsum; raw rows never re-shuffle.

    With ``by``, boundaries are computed WITHIN each group (per-domain
    equi-depth discretization): the running count becomes a window
    PARTITIONED BY the group (parallel per group — the global path's
    single-reducer concern does not arise), per-group targets
    ``ceil(j·n_g/k)`` are exact integer expressions (never driver
    scalars), and the group-cardinality-sized bounds table broadcasts
    back through a NULL-SAFE LEFT join — NULL group keys match their
    own stats row instead of being dropped, and groups with no
    non-NULL values (absent from bounds) keep their rows with bin 1,
    exactly as the global path treats NULL values.
    """
    if k < 1:
        # k = 0 yields no boundaries and every row silently lands in
        # bin 1 — an error, not a degenerate discretization
        raise ValueError(f"quantile_bins bucket count must be >= 1, got {k}")
    if by:
        from pyspark.sql.window import Window

        c = F.col(col)
        counts = (
            df.where(c.isNotNull())
            .groupBy(*by, c.alias("__v"))
            .agg(F.count("*").alias("__cnt"))
        )
        w_cum = (
            Window.partitionBy(*by)
            .orderBy(F.col("__v").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = counts.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
            "__n", F.sum("__cnt").over(Window.partitionBy(*by))
        )
        bounds = cum.groupBy(*by).agg(
            *[
                F.min(
                    F.when(
                        F.col("__cum") >= F.expr(f"({j} * __n + {k - 1}) DIV {k}"),
                        F.col("__v"),
                    )
                ).alias(f"__b{j}")
                for j in range(1, k)
            ]
        )
        joined = _join_null_safe(df, F.broadcast(bounds), by, how="left")
        bin_expr: Column = F.lit(1)
        for j in range(1, k):
            bin_expr = bin_expr + F.when(c > F.col(f"__b{j}"), 1).otherwise(0)
        return joined.withColumn("bin", bin_expr.cast("int")).drop(
            *[f"__b{j}" for j in range(1, k)]
        )
    c = F.col(col)
    counts = df.where(c.isNotNull()).groupBy(c.alias("__v")).agg(
        F.count("*").alias("__cnt")
    )
    cum = global_cumsum(counts, [F.col("__v").asc()], ["__cnt"])
    n = df.where(c.isNotNull()).count()
    targets = [-(-(j * n) // k) for j in range(1, k)]  # ceil(j*n/k)
    bounds = cum.agg(
        *[
            F.min(F.when(F.col("cum___cnt") >= F.lit(t), F.col("__v"))).alias(
                f"__b{j}"
            )
            for j, t in enumerate(targets, start=1)
        ]
    )
    joined = df.join(F.broadcast(bounds))
    bin_expr: Column = F.lit(1)
    for j in range(1, k):
        bin_expr = bin_expr + F.when(c > F.col(f"__b{j}"), 1).otherwise(0)
    return joined.withColumn("bin", bin_expr.cast("int")).drop(
        *[f"__b{j}" for j in range(1, k)]
    )


def target_encode_loo(
    df: DataFrame, cat_col: str, target: Column, out_col: str = "loo_enc"
) -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean of
    ``target`` over the OTHER rows of its category —
    ``(Σ_cat − y) / (cnt_cat − 1)`` — the leakage-free form of mean
    encoding (encoding a row with a statistic that includes its own
    label leaks the label into the feature). NULL for singleton
    categories.

    ``target`` must be an integer expression (pre-quantize money to
    cents) so the category sums are exact and the one division is the
    only float op. One hash aggregate + one join of the category-sized
    aggregate back to the rows (AQE broadcasts it when small) — the
    canonical two-pass shape at any scale.

    Edge contract: the stats join is NULL-SAFE on the category (a
    plain ``on=cat_col`` equi-join silently DELETED every NULL-category
    row — NULL forms its own encoding group here, matching the
    aggregate's null group); the count is of NON-NULL targets, so
    NULL-target rows neither contribute a phantom 0 to their
    category's mean nor inflate its denominator (their own ``loo_enc``
    is NULL via the sum arithmetic). The registry oracle corpus
    (orders) has no NULL categories or targets, so both engines agree
    there; DuckDB's ``JOIN USING`` is not null-safe, which is why the
    oracle mirrors the NULL-free corpus rather than this edge.
    """
    with_y = df.withColumn("__y", target)
    agg = with_y.groupBy(cat_col).agg(
        F.sum("__y").alias("__cat_sum"), F.count("__y").alias("__cat_cnt")
    )
    joined = _join_null_safe(with_y, agg, [cat_col])
    enc = F.when(
        F.col("__cat_cnt") > 1,
        (F.col("__cat_sum") - F.col("__y")).cast("double")
        / (F.col("__cat_cnt") - F.lit(1)).cast("double"),
    )
    return joined.withColumn(out_col, enc).drop("__cat_sum", "__cat_cnt")
