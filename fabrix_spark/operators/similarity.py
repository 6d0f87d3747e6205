"""Similarity search over embedding columns (ArrayType(FloatType)).

Baseline: brute-force cosine top-k (broadcast the query side — the
corpus side never shuffles). Scale path: deterministic random-
hyperplane LSH bucketing so candidate generation is an equi-join on
bucket signature instead of a cross join.

No UDFs: dot products are ``zip_with`` + ``aggregate`` expressions
(JVM codegen). Quantized int64 scoring available for bit-exact
reproducibility across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import spread

__all__ = [
    "cosine_topk",
    "cosine_range_search",
    "cosine_topk_blocked",
    "plane_sign",
    "plane_signs",
    "hyperplane_lsh_buckets",
    "lsh_cosine_topk",
    "knn_graph",
    "ivf_assign",
    "ivf_assign_expr",
    "ivf_assign_blocked",
    "kmeans_train",
    "kmeans_train_rows",
    "ivf_cosine_topk",
    "mmr_rerank",
    "pq_train",
    "pq_encode",
    "pq_cosine_topk",
    "ivfpq_topk",
    "PQStore",
    "signed_projection",
    "rp_topk",
    "gram_matrix",
    "power_iteration_top",
    "pca_project",
]


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _quantized(vec: Column, scale: int) -> Column:
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _quantized_guarded(vec: Column, scale: int) -> Column:
    """Quantizer with the NaN/NULL-component guard FUSED into the same
    array pass (r18, recovering the r17 ``_finite_vectors`` cost — the
    separate ``exists()`` pre-filter was a second interpreted traversal
    of every corpus vector): a NaN or NULL component maps to a NULL
    element instead of dying at the ANSI long cast, the NULL then
    propagates through the dot product to a NULL norm, and the
    call-site ``n2 > 0`` filter excludes the row — the exact same rows
    :func:`_finite_vectors` excluded, in zero extra passes. A NULL
    vector likewise quantizes to NULL → NULL norm → excluded.
    Components that are finite but un-castable (±Inf, > long range)
    still die at the ANSI cast exactly as before — this fuses the
    guard, it does not widen it."""
    return F.transform(
        vec,
        lambda x: F.when(
            ~(x.isNull() | F.isnan(x.cast("double"))),
            F.round(x.cast("double") * scale).cast("long"),
        ),
    )


def _as_double_guarded(vec: Column) -> Column:
    """Unquantized twin of :func:`_quantized_guarded`: NaN and NULL
    components both map to NULL (NaN would otherwise survive the cast
    and ``NaN > 0`` is false for the norm filter anyway, but mapping it
    to NULL keeps the two guarded casters' exclusion mechanics
    identical: poisoned component → NULL element → NULL norm →
    excluded by ``n2 > 0``)."""
    return F.transform(
        vec,
        lambda x: F.when(~(x.isNull() | F.isnan(x.cast("double"))), x.cast("double")),
    )


def _dot(a: Column, b: Column, integer: bool) -> Column:
    zero = F.lit(0).cast("long") if integer else F.lit(0.0)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x)


def _finite_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Exclude NULL vectors and vectors with NULL/NaN components from
    the expression-path scorers (r17 self-review, completing the r16
    NaN hardening that covered the numpy paths): a NaN component dies
    at the ANSI long cast inside the quantizer BEFORE any downstream
    filter could drop the row, so one poisoned vector killed the whole
    scan. Zero-NORM vectors are excluded separately by the ``n2 > 0``
    filters at the call sites (cosine is undefined for the zero
    vector, and the 0/0 double division is a task-killing
    DIVIDE_BY_ZERO under ANSI mode)."""
    v = F.col(vec_col)
    return df.filter(
        v.isNotNull() & ~F.exists(v, lambda x: x.isNull() | F.isnan(x.cast("double")))
    )


def _pair_key(col: str) -> Column:
    """Single-valued non-foldable join key so corpus × broadcast-queries
    runs as a broadcast HASH join rather than a nested-loop node.

    ``pmod(xxhash64(id), 1)`` is always 0, never NULL (xxhash64 hashes
    a NULL input to the seed — so NULL-id rows still pair; the old
    ``length(cast(id as string)) * 0`` was NULL for NULL ids and
    silently dropped those rows from the join), and Catalyst cannot
    constant-fold it (a coalesce/* 0 form gets simplified to a literal
    once the input is provably non-null, which collapses the equi-key
    and degrades the join to BroadcastNestedLoopJoin)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    quantize: int | None = 1_000_000,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding itself when ids collide).

    The query side is broadcast — the big corpus never moves. Per-query
    ranking is a window partitioned by query id with a deterministic
    (score desc, id asc) order. With ``quantize`` set, dots/norms are
    exact int64 so results reproduce bitwise on any engine.
    """
    query_id_col = query_id_col or id_col
    if quantize:
        cvec = _quantized_guarded(F.col(vec_col), quantize)
        integer = True
    else:
        cvec = _as_double_guarded(F.col(vec_col))
        integer = False

    # single-valued non-foldable key (see ivf_assign): the corpus ×
    # broadcast-queries pairing runs as a broadcast HASH join rather
    # than a nested-loop node. Both sides drop NULL/NaN vectors and
    # zero-norm vectors (cosine undefined; the 0/0 double division is
    # an ANSI DIVIDE_BY_ZERO task killer) — the NaN/NULL guard is
    # FUSED into the quantize pass (r18): a poisoned component becomes
    # a NULL element, the norm goes NULL, and the n2 > 0 filter below
    # drops the row, so the old standalone _finite_vectors exists()
    # traversal no longer runs.
    one = _pair_key
    c = (
        spread(corpus)
        .select(F.col(id_col).alias("c_id"), cvec.alias("c_vec"))
        .withColumn("c_n2", _dot(F.col("c_vec"), F.col("c_vec"), integer))
        .filter(F.col("c_n2") > 0)
        .withColumn("__one", one("c_id"))
    )
    q = (
        queries.select(F.col(query_id_col).alias("q_id"), cvec.alias("q_vec"))
        .withColumn("q_n2", _dot(F.col("q_vec"), F.col("q_vec"), integer))
        .filter(F.col("q_n2") > 0)
        .withColumn("__one", one("q_id"))
    )

    scored = (
        c.join(F.broadcast(q), "__one")
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"), integer)
                / F.sqrt(F.col("c_n2").cast("double") * F.col("q_n2").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    quantize: int | None = 1_000_000,
    exclude_self: bool = True,
) -> DataFrame:
    """Cosine RANGE search: every corpus vector within ``threshold``
    of each query — the radius-query complement of :func:`cosine_topk`
    (recall-critical jobs want "everything at least this similar", not
    a fixed k: decontamination sweeps, near-dup audits, RAG retrieval
    cutoffs).

    ``exclude_self`` (default True, the self-search contract) drops
    pairs where the corpus id equals the query id. Set it False when
    corpus and queries are INDEPENDENT tables whose id spaces may
    collide — e.g. decontamination, where a zero-based benchmark id
    colliding with a zero-based corpus id must still be probed.

    Scale shape: strictly better than top-k — the broadcast-hash join
    against the (small) query side plus a per-row threshold filter is
    MAP-ONLY: no window, no shuffle, nothing ranked, so the corpus
    scan parallelizes perfectly and output size is bounded by how much
    actually matches. With ``quantize`` set, dots/norms are exact
    int64 so results reproduce bitwise on any engine."""
    query_id_col = query_id_col or id_col
    if quantize:
        cvec = _quantized_guarded(F.col(vec_col), quantize)
        integer = True
    else:
        cvec = _as_double_guarded(F.col(vec_col))
        integer = False
    # NULL/NaN/zero-norm exclusion: same contract as cosine_topk — the
    # guard is fused into the quantize pass (r18), poisoned components
    # become NULL elements and the n2 > 0 filter excludes the row
    c = (
        spread(corpus)
        .select(F.col(id_col).alias("c_id"), cvec.alias("c_vec"))
        .withColumn("c_n2", _dot(F.col("c_vec"), F.col("c_vec"), integer))
        .filter(F.col("c_n2") > 0)
        .withColumn("__one", _pair_key("c_id"))
    )
    q = (
        queries.select(F.col(query_id_col).alias("q_id"), cvec.alias("q_vec"))
        .withColumn("q_n2", _dot(F.col("q_vec"), F.col("q_vec"), integer))
        .filter(F.col("q_n2") > 0)
        .withColumn("__one", _pair_key("q_id"))
    )
    joined = c.join(F.broadcast(q), "__one")
    if exclude_self:
        joined = joined.filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
    return (
        joined
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"), integer)
                / F.sqrt(F.col("c_n2").cast("double") * F.col("q_n2").cast("double")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Brute-force cosine top-k via Arrow-batched matrix multiply —
    the throughput path for the same contract as :func:`cosine_topk`.

    Each corpus partition arrives as pandas batches; one numpy
    ``(batch × dim) @ (dim × n_queries)`` int64 matmul scores a whole
    batch against every query at once (~10-100× the per-pair
    ``aggregate`` expression), then only rows at-or-near the per-batch
    per-query k-th score leave Python (tie-safe cut — see the comment
    in ``block``). Final ranking happens in Spark on the exact integer
    dot/norm values, so results are bit-identical to the expression
    path (and its DuckDB oracle): quantization uses half-away-from-zero
    rounding like ``F.round``, and all emitted scores are int64 — no
    float ever crosses an engine boundary.

    Scale shape: corpus never shuffles (map-side scoring + local
    top-k); the global window ranks only ``≈ partitions × k`` (plus
    round-ties) candidate rows per query. Query side must fit in a
    broadcast (same contract as the expression path)."""
    import numpy as np
    import pandas as pd

    query_id_col = query_id_col or id_col
    if not _integral_id(queries, query_id_col) or not _integral_id(corpus, id_col):
        # the vectorized kernel packs ids into int64 numpy arrays; a
        # string or NULL id would die deep in the executor with an
        # opaque cast error — fall back to the expression path, which
        # handles any id type with the same contract (r16 self-review)
        return cosine_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, quantize=quantize,
        )
    q_rows = queries.select(F.col(query_id_col), F.col(vec_col)).collect()
    import math as _math

    # driver-side twin of _finite_vectors: a NaN query component would
    # quantize to a garbage int64 column of the broadcast matrix and
    # silently mis-rank every candidate for that query
    q_rows = [
        r
        for r in q_rows
        if r[0] is not None
        and r[1] is not None
        and all(x is not None and _math.isfinite(float(x)) for x in r[1])
    ]
    if not q_rows:
        empty = "q_id long, c_id long, cosine double, rank int"
        return corpus.sparkSession.createDataFrame([], empty)

    # _np_quant, NOT a naive floor(s+0.5): the naive form diverges
    # from F.round on repr-tie values (the 0.49999999999999994 class),
    # which would break this path's bit-parity contract with
    # cosine_topk and the oracle (r16 self-review)
    def _quant(m: "np.ndarray") -> "np.ndarray":
        return _np_quant(m, quantize)

    q_ids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qm = _quant(np.asarray([list(r[1]) for r in q_rows]))
    q_n2 = (qm * qm).sum(axis=1)
    # ship the (tiny) query matrix to executors once, not per task
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, qm.T.copy(), q_n2))

    def block(batches):
        b_qids, b_qt, b_qn2 = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["__cid"].to_numpy(dtype=np.int64)
            cm = _quant(np.stack(pdf["__cvec"].to_numpy()))
            dots = cm @ b_qt  # (batch, nq) int64 — exact
            c_n2 = (cm * cm).sum(axis=1)
            # Batch-local preselection must never clip a candidate the
            # global (rounded-cosine desc, c_id asc) rank could keep.
            # Keep every row whose raw score is within 2e-6 of the
            # per-query k-th largest: two scores that round equal at
            # 6 dp differ by < 1e-6, so any candidate below that cut
            # is strictly out-ranked by ≥ k batch-mates after rounding
            # — regardless of c_id ties. (A fixed +N slack can clip
            # the lowest-c_id members of a large tie group, e.g. many
            # exact-duplicate embeddings in one Arrow batch.)
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = dots / np.sqrt(
                    c_n2[:, None].astype(np.float64) * b_qn2[None, :]
                )
            # zero-norm vectors give 0/0 = NaN, and np.partition sorts
            # NaN LARGEST — one such row would poison the per-query
            # kth cut (candidates silently clipped, or the whole batch
            # emitting nothing). Zero-norm rows have no defined cosine
            # and are excluded, like the expression path's NULL-cosine
            # rows falling out of the top-k (r16 self-review).
            np.putmask(raw, ~np.isfinite(raw), -np.inf)
            np.putmask(raw, c_ids[:, None] == b_qids[None, :], -np.inf)
            nb = len(c_ids)
            if nb > k:
                kth = np.partition(raw, nb - k, axis=0)[nb - k]
                mask = raw >= (kth - 2e-6)
            else:
                mask = np.ones_like(raw, dtype=bool)
            mask &= raw != -np.inf  # self-pairs never leave the batch
            ii, jj = np.nonzero(mask)
            rows = {
                "q_id": b_qids[jj],
                "c_id": c_ids[ii],
                "dot": dots[ii, jj],
                "c_n2": c_n2[ii],
                "q_n2": b_qn2[jj],
                "self": np.zeros(len(ii), dtype=bool),
            }
            yield pd.DataFrame(rows)

    # NULL ids cannot enter the int64/stack kernel — excluded
    # (documented divergence from the expression path, which pairs
    # NULL-id rows; this is the triage path). _finite_vectors, not a
    # bare isNotNull: a NaN component casts to a garbage int64 INSIDE
    # the kernel (before the isfinite mask, which only sees the
    # already-cast values) and emitted silently wrong candidates —
    # the exact twin EXCLUDES such rows (r17 self-review)
    cand = _finite_vectors(corpus, vec_col).where(
        F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("__cid"), _as_double(F.col(vec_col)).alias("__cvec")
    ).mapInPandas(
        block, "q_id long, c_id long, dot long, c_n2 long, q_n2 long, self boolean"
    )
    scored = cand.filter(~F.col("self")).select(
        "q_id",
        "c_id",
        F.round(
            F.col("dot") / F.sqrt(F.col("c_n2").cast("double") * F.col("q_n2").cast("double")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _cosine(a: Column, b: Column, a_n2: Column, b_n2: Column, integer: bool) -> Column:
    """6-dp rounded cosine from precomputed squared norms — NULL when
    either norm is 0 (or NULL): cosine is undefined there, and under
    ANSI mode the bare 0/0 double division is TASK-KILLING, not NaN.
    The division sits INSIDE the when() branch (a mere conjunct guard
    beside a shared subexpression still divides — subexpression
    elimination force-evaluates it; see features.standardize). Entry
    points additionally EXCLUDE zero-norm rows where the family
    contract says so; this guard is the backstop for scorers whose
    norms are computed mid-plan (e.g. rp_topk's projected norms, which
    can be 0 for a nonzero vector when the signed projection
    cancels)."""
    return F.when(
        (a_n2 > 0) & (b_n2 > 0),
        F.round(
            _dot(a, b, integer) / F.sqrt(a_n2.cast("double") * b_n2.cast("double")), 6
        ),
    )


def signed_projection(
    vec: Column, out_dim: int = 16, quantize: int = 10_000
) -> Column:
    """Signed (Rademacher ±1) random projection to ``out_dim`` integer
    components — the Johnson-Lindenstrauss / Achlioptas (2003)
    database-friendly projection, the standard way to shrink an
    embedding before distance work at corpus scale.

    The sign matrix is derived per (i, j) from a fixed modular mix
    (``((i·2654435761 + j·40499) mod 1000003) mod 2``), so no matrix
    is stored, broadcast, or collected — any engine rebuilds the
    identical projection from the formula (the oracle does). Inputs
    quantize to int64 at ``quantize`` (1e4 keeps every downstream
    16-dim dot ≤ ~1.6e12, inside exact-double range), so projected
    vectors and their dot products are exact integers — bit-identical
    across engines and partitionings. Map-only: one expression per
    row, no shuffle, no state."""
    v = _quantized(vec, quantize)
    return F.transform(
        F.sequence(F.lit(1), F.lit(out_dim)),
        lambda j: F.aggregate(
            F.transform(
                v,
                lambda x, i0: x
                * F.when(
                    ((i0 + 1) * F.lit(2654435761) + j * F.lit(40499))
                    % F.lit(1000003)
                    % 2
                    == 0,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def rp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    out_dim: int = 16,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Random-projection-accelerated cosine top-k: candidates are
    ranked in the ``out_dim``-dimensional projected space (dots cost
    ``out_dim/dim`` of the full-width ones), the per-query top
    ``k·oversample`` survivors are re-ranked by the exact full-width
    integer-cosine recipe, and the final top-k is emitted in
    :func:`cosine_topk`'s (q_id, c_id, cosine, rank) contract.

    Both stages are deterministic (projection and candidate ranking
    are exact int64 with (score desc, id asc) tie-breaks), so the
    whole approximate pipeline — including which candidates survive —
    is oracle-able, same as the LSH/IVF families.

    Scale shape: projection is a map-only pass over the corpus; the
    query side (projected + full-width) broadcasts; candidate scoring
    touches ``out_dim``-wide vectors only, and the full-width vectors
    are re-read for just ``k·oversample`` rows per query. The
    per-query ranking window has the same shape as cosine_topk —
    compose with the blocked/LSH/IVF candidate structures when the
    query side grows."""
    query_id_col = query_id_col or id_col
    proj = signed_projection(F.col(vec_col), out_dim)
    full = _quantized(F.col(vec_col), quantize)

    # NULL/NaN-component vectors excluded (NaN dies at the quantizer's
    # ANSI long cast before any filter could drop it) and zero-NORM
    # vectors excluded (cosine undefined) — the exact family's
    # contract, uniform across the approximate ops (r17 self-review).
    # A nonzero vector whose signed PROJECTION cancels to zero norm
    # stays: its projected score is NULL (ranks last among candidates),
    # and the exact rescore uses the real full-width cosine.
    def side(df: DataFrame, idc: str, tag: str) -> DataFrame:
        return (
            _finite_vectors(df, vec_col)
            .select(
                F.col(idc).alias(f"{tag}_id"),
                proj.alias(f"{tag}_p"),
                full.alias(f"{tag}_vec"),
            )
            .withColumn(f"{tag}_pn2", _dot(F.col(f"{tag}_p"), F.col(f"{tag}_p"), True))
            .withColumn(f"{tag}_n2", _dot(F.col(f"{tag}_vec"), F.col(f"{tag}_vec"), True))
            .filter(F.col(f"{tag}_n2") > 0)
            .withColumn("__one", _pair_key(f"{tag}_id"))
        )

    c = side(spread(corpus), id_col, "c")
    q = side(queries, query_id_col, "q")
    # the candidate-ranking window carries ONLY (q_id, c_id, __pcos) —
    # previously the full-width c_vec/q_vec rode through the shuffle
    # for EVERY corpus × query pair (~dim/out_dim times wider than
    # needed, 48× at dim=768/out_dim=16), contradicting the "re-read
    # full vectors for k·oversample rows only" claim (r16 self-review).
    # The survivors join back for the exact re-score: the kept-id set
    # is queries × k·oversample rows — broadcast — so the second
    # corpus scan is map-only with no shuffle.
    cand = (
        c.select("c_id", "c_p", "c_pn2", "__one")
        .join(F.broadcast(q.select("q_id", "q_p", "q_pn2", "__one")), "__one")
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select(
            "q_id",
            "c_id",
            _cosine(
                F.col("c_p"), F.col("q_p"), F.col("c_pn2"), F.col("q_pn2"), True
            ).alias("__pcos"),
        )
    )
    cw = Window.partitionBy("q_id").orderBy(F.col("__pcos").desc(), F.col("c_id").asc())
    kept_ids = (
        cand.withColumn("__crank", F.row_number().over(cw))
        .filter(F.col("__crank") <= k * oversample)
        .select("q_id", "c_id")
    )
    kc = c.select(F.col("c_id").alias("__kcid"), "c_vec", "c_n2")
    kq = q.select(F.col("q_id").alias("__kqid"), "q_vec", "q_n2")
    # eqNullSafe join keys: _pair_key deliberately keeps NULL-id rows
    # pairing, so the rescore joins must not drop them
    kept = (
        F.broadcast(kept_ids)
        .join(kc, F.col("c_id").eqNullSafe(F.col("__kcid")))
        .join(F.broadcast(kq), F.col("q_id").eqNullSafe(F.col("__kqid")))
        .select(
            "q_id",
            "c_id",
            _cosine(
                F.col("c_vec"), F.col("q_vec"), F.col("c_n2"), F.col("q_n2"), True
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return kept.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by
    cosine (IVF coarse quantizer). Centroids are broadcast — the corpus
    never shuffles for assignment. Deterministic tie-break:
    (cosine desc, centroid id asc)."""
    cvec = _quantized(F.col(vec_col), quantize)
    # single-valued but non-foldable key: Catalyst would fold lit==lit
    # back into a nested-loop cross join; a derived 0 keeps the
    # broadcast HASH join (build side = n_centroids rows). _pair_key,
    # not the old length(cast)*0 form — that one was NULL for NULL ids
    # (silently unassigned rows) and foldable once the id is provably
    # non-null (r16 self-review; see _pair_key's docstring)
    one = _pair_key
    # NULL/NaN/zero-norm vectors and centroids excluded — the family
    # contract (r17 self-review): a NaN component killed the whole
    # assignment at the quantizer's ANSI long cast, a zero-norm row
    # the cosine division
    vecs = (
        spread(_finite_vectors(corpus, vec_col))
        .select(F.col(id_col), cvec.alias("__v"))
        .withColumn("__v_n2", _dot(F.col("__v"), F.col("__v"), True))
        .filter(F.col("__v_n2") > 0)
        .withColumn("__one", one(id_col))
    )
    cents = (
        _finite_vectors(centroids, vec_col)
        .select(F.col(id_col).alias("centroid_id"), cvec.alias("__c"))
        .withColumn("__c_n2", _dot(F.col("__c"), F.col("__c"), True))
        .filter(F.col("__c_n2") > 0)
        .withColumn("__one", one("centroid_id"))
    )

    scored = vecs.join(F.broadcast(cents), "__one").select(
        id_col,
        "centroid_id",
        _cosine(F.col("__v"), F.col("__c"), F.col("__v_n2"), F.col("__c_n2"), True).alias(
            "__cos"
        ),
    )
    if n_probe == 1:
        # nearest-only: a max_by hash aggregate (map-side partials, no
        # sort) instead of a window — the ordering struct (cos desc,
        # centroid asc via negation) is unique per row, so the result
        # is identical to the row_number path bit-for-bit
        return scored.groupBy(id_col).agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("__cos"), (-F.col("centroid_id")).alias("__nc")),
            ).alias("centroid_id")
        )
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .select(id_col, "centroid_id")
    )


def _integral_id(df: DataFrame, col: str) -> bool:
    """The driver-held trainers (:func:`kmeans_train_rows` /
    :func:`pq_train_rows`) coerce seed ids with ``int(...)`` and emit a
    ``long`` id schema; any non-integral id column routes through the
    all-DataFrame path, which preserves the input id type."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return isinstance(
        df.schema[col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )


def _round_half_up(p: float) -> int:
    """EXACT Python twin of Spark's ``F.round(double)``: Spark rounds
    through ``BigDecimal.valueOf(d)`` = ``new BigDecimal(
    Double.toString(d))`` with HALF_UP — i.e. HALF_UP on the SHORTEST
    DECIMAL REPR of the double, not on its full binary expansion.
    Python's ``repr(float)`` is the same shortest round-trip decimal,
    so ``Decimal(repr(p))`` sees the identical digits. (A naive
    ``floor(p + 0.5)`` differs on values like 0.49999999999999994
    where the binary ``+0.5`` rounds up.)"""
    import decimal

    return int(
        decimal.Decimal(repr(p)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def _np_quant(m, quantize: int):
    """Vectorized EXACT twin of ``_quantized`` (``F.round`` on the
    double product = decimal HALF_UP over the double's shortest repr).
    The vectorized half-away-from-zero form is used for every element
    whose scaled value sits further than 1e-6 from a .5 boundary —
    there the two rules provably agree (repr error < half-ULP ≈ 1e-10
    at this magnitude, binary ``+0.5`` error likewise) — and the rare
    near-tie elements go through :func:`_round_half_up` so repr-tie
    values (the 0.49999999999999994 class) match the expression path
    bit-for-bit regardless of which dispatch branch runs."""
    import numpy as np

    s = m.astype(np.float64) * quantize
    naive = np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5))
    frac = np.abs(s - np.trunc(s))
    near = np.abs(frac - 0.5) < 1e-6
    if near.any():
        flat_s = s.ravel()
        flat_n = naive.ravel()
        for i in np.nonzero(near.ravel())[0].tolist():
            flat_n[i] = _round_half_up(float(flat_s[i]))
        naive = flat_n.reshape(s.shape)
    return naive.astype(np.int64)


def _np_round6(a):
    """Vectorized EXACT twin of Spark's ``F.round(x, 6)``: decimal
    HALF_UP over the double's shortest repr (``np.round`` is
    half-to-even and WOULD diverge on 6-dp ties — w_cume_percent
    history). Cost is one Decimal op per element; callers only apply it
    to (rows × k) assignment matrices, never to pairwise blocks."""
    import decimal

    import numpy as np

    six = decimal.Decimal("0.000001")
    flat = a.ravel()
    out = np.empty(flat.shape, dtype=np.float64)
    for i, x in enumerate(flat.tolist()):
        out[i] = float(
            decimal.Decimal(repr(x)).quantize(six, rounding=decimal.ROUND_HALF_UP)
        )
    return out.reshape(a.shape)


def _np_assign(Q, n2, C, cn2, cids):
    """Nearest-centroid ids for a quantized batch: exact int64 dot
    matmul, IEEE double cosine, 6-dp decimal rounding, argmax with the
    (cos desc, cid asc) tie-break — ``np.argmax`` returns the FIRST
    max and ``cids`` is ascending, which IS max_by(cid, (cos, -cid))."""
    import numpy as np

    dots = Q @ C.T
    raw = dots / np.sqrt(n2[:, None].astype(np.float64) * cn2[None, :].astype(np.float64))
    cos = _np_round6(raw)
    return cids[np.argmax(cos, axis=1)]


def _prep_centroids(centroid_rows: list[tuple[int, list[float]]], quantize: int):
    """(ascending cids, quantized k×dim int64 matrix, k norms) — the
    driver-held form every numpy stage broadcasts. Quantization uses
    :func:`_round_half_up` (bit-exact ``F.round`` parity)."""
    import numpy as np

    rows = sorted(centroid_rows)
    cids = np.asarray([cid for cid, _ in rows], dtype=np.int64)
    C = np.asarray(
        [[_round_half_up(float(x) * quantize) for x in cvec] for _, cvec in rows],
        dtype=np.int64,
    )
    return cids, C, (C * C).sum(axis=1)


def _centroid_argmax(
    v: Column, n2: Column, centroid_rows: list[tuple[int, list[float]]], quantize: int
) -> Column:
    """Nearest-centroid id as ONE column expression over an already-
    quantized vector column: array_max over (cos, -cid, cid) structs —
    lexicographic struct order reproduces the join path's
    ``max_by(centroid_id, struct(cos, -centroid_id))`` tie-break.

    Centroid components are quantized DRIVER-SIDE with
    :func:`_round_half_up` (bit-exact ``F.round`` parity) and inlined
    as long literals, and each centroid's norm is one precomputed
    literal: Catalyst does NOT constant-fold higher-order functions, so
    quantizing via a ``transform`` over a literal array would re-run
    interpreted per row × per centroid — the pre-quantized form keeps
    the per-row work to k integer dot products, the same arithmetic the
    broadcast-join path does per joined pair."""
    import math as _math

    scored = []
    for cid, cvec in centroid_rows:
        if cvec is None or any(x is None or not _math.isfinite(float(x)) for x in cvec):
            # a NaN component would die in _round_half_up; exclusion
            # matches ivf_assign's _finite_vectors contract
            continue
        qc = [_round_half_up(float(x) * quantize) for x in cvec]
        if not any(qc):
            continue  # zero-norm centroid: no defined cosine to it
        c = F.array(*[F.lit(q).cast("long") for q in qc])
        cn2 = F.lit(sum(q * q for q in qc)).cast("long")
        scored.append(
            F.struct(
                _cosine(v, c, n2, cn2, True).alias("cos"),
                F.lit(-int(cid)).cast("long").alias("nc"),
                F.lit(int(cid)).cast("long").alias("cid"),
            )
        )
    if not scored:
        raise ValueError("no scoreable centroids (all NULL/NaN/zero-norm)")
    return F.array_max(F.array(*scored))["cid"]


def ivf_assign_expr(
    corpus: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """Nearest-centroid assignment with the centroid table inlined as a
    LITERAL expression — a map-only plan: no broadcast join, no max_by
    aggregate shuffle, no job at all until an action. Bit-identical to
    ``ivf_assign(n_probe=1)``: the literal centroid arrays go through
    the SAME ``_quantized`` expression (Catalyst constant-folds them
    with its own round semantics, so no Python rounding can drift) and
    the argmax is an ``array_max`` over (cos, -cid, cid) structs —
    lexicographic struct order == the join path's
    ``max_by(centroid_id, struct(cos, -centroid_id))`` tie-break.

    This is the small-centroid-table path (the k×dim table a FAISS
    coarse quantizer holds in RAM); for centroid tables too big to
    inline (k×dim beyond ~10⁴ entries) use :func:`ivf_assign`, whose
    broadcast join scales with the build side."""
    out = (
        spread(_finite_vectors(corpus, vec_col))
        .select(F.col(id_col), _quantized(F.col(vec_col), quantize).alias("__v"))
        .withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True))
        .filter(F.col("__n2") > 0)
    )
    return out.withColumn(
        "centroid_id",
        _centroid_argmax(F.col("__v"), F.col("__n2"), centroid_rows, quantize),
    ).select(id_col, "centroid_id")


def kmeans_train_rows(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> list[tuple[int, list[float]]]:
    """:func:`kmeans_train` with the centroid table held on the DRIVER
    (k×dim floats — exactly what FAISS keeps in RAM for its coarse
    quantizer), cutting each Lloyd iteration to ONE Spark job: an
    Arrow-batched numpy stage assigns each batch (exact int64 matmul +
    6-dp decimal-rounded cosine — see :func:`_np_assign`) and emits
    per-partition (centroid, dim) PARTIAL integer sums; one tiny
    aggregate folds the partials, the same in-Spark rounded division as
    the DataFrame trainer produces the means, and only the k×dim
    result rows come back to the driver. Partial int64 sums are
    associative, so centroids are independent of partitioning and
    bit-identical to :func:`kmeans_train` / the SQL oracle."""
    import numpy as np
    import pandas as pd

    # NULL ids sort FIRST under asc() and would crash int(r[0]) on the
    # driver; NULL embeddings would crash np.stack inside the executor;
    # a NaN component would silently train a garbage centroid via
    # NaN.astype(int64) — exclude all three (r16/r17 self-review)
    corpus = _finite_vectors(corpus, vec_col).where(F.col(id_col).isNotNull())
    seed = (
        corpus.orderBy(F.col(id_col).asc()).limit(k).select(id_col, vec_col).collect()
    )
    cents = [(int(r[0]), [float(x) for x in r[1]]) for r in seed]
    dim = len(cents[0][1]) if cents else 0
    spark = corpus.sparkSession
    # No spread(): per-row work here is one vectorized numpy matmul per
    # Arrow batch, so scattering a small input to every core buys
    # nothing while its repartition shuffle costs a fixed ~0.2 s per
    # job; at real scale parquet arrives in thousands of splits and
    # parallelism comes from the scan itself.
    base = corpus.select(_as_double(F.col(vec_col)).alias("__dv"))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(_prep_centroids(cents, quantize))

        def partials(batches, _bc=bc):
            b_cids, b_C, b_cn2 = _bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                Q = _np_quant(np.stack(pdf["__dv"].to_numpy()), quantize)
                n2 = (Q * Q).sum(axis=1)
                a = _np_assign(Q, n2, b_C, b_cn2, b_cids)
                for cid in np.unique(a):
                    members = Q[a == cid]
                    yield pd.DataFrame(
                        {
                            "centroid_id": np.full(dim, cid, dtype=np.int64),
                            "dim": np.arange(dim, dtype=np.int64),
                            "val": members.sum(axis=0),
                            "cnt": np.full(dim, len(members), dtype=np.int64),
                        }
                    )

        rows = (
            base.mapInPandas(partials, "centroid_id long, dim long, val long, cnt long")
            .groupBy("centroid_id", "dim")
            .agg(F.sum("val").alias("__s"), F.sum("cnt").alias("__c"))
            .select(
                "centroid_id",
                "dim",
                F.round(F.col("__s") / F.col("__c")).cast("long").alias("__cc"),
            )
            .collect()
        )
        by_cid: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            by_cid.setdefault(int(r["centroid_id"]), []).append(
                (int(r["dim"]), int(r["__cc"]))
            )
        # __cc / quantize is the same IEEE double division the
        # DataFrame trainer folds in Spark — values identical
        cents = [
            (cid, [cc / quantize for _, cc in sorted(comps)])
            for cid, comps in sorted(by_cid.items())
        ]
    return cents


def ivf_assign_blocked(
    corpus: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-batched numpy twin of ``ivf_assign(n_probe=1)`` for a
    driver-held centroid table: map-only (no join, no aggregate), one
    int64 matmul per batch, bit-identical assignment (see
    :func:`_np_assign` for the rounding/tie-break parity argument).
    ``keep_vec=True`` carries the double vector through for a
    downstream per-cluster stage. Requires an integral id column
    (callers fall back to :func:`ivf_assign` otherwise)."""
    import numpy as np
    import pandas as pd

    bc = corpus.sparkSession.sparkContext.broadcast(
        _prep_centroids(centroid_rows, quantize)
    )
    schema = f"{id_col} long, centroid_id long" + (
        f", {vec_col} array<double>" if keep_vec else ""
    )

    def block(batches):
        b_cids, b_C, b_cn2 = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            Q = _np_quant(np.stack(pdf["__dv"].to_numpy()), quantize)
            n2 = (Q * Q).sum(axis=1)
            a = _np_assign(Q, n2, b_C, b_cn2, b_cids)
            out = {id_col: pdf["__id"].to_numpy(dtype=np.int64), "centroid_id": a}
            if keep_vec:
                out[vec_col] = pdf["__dv"]
            yield pd.DataFrame(out)

    # no spread(): vectorized-matmul stage — see kmeans_train_rows
    return (
        corpus
        .select(F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__dv"))
        .mapInPandas(block, schema)
    )


def kmeans_train(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """Deterministic Lloyd iterations for IVF centroid training,
    entirely as DataFrame ops: seed = the k lowest-id vectors, then
    per iteration (1) assign every vector to its nearest centroid by
    cosine (broadcast hash join — the corpus never shuffles for
    assignment), (2) recompute centroids as the element-wise mean via
    posexplode → (cluster, dim) hash aggregate.

    All arithmetic stays in the quantized int64 domain (sums exact,
    one rounded division per component), so training is reproducible
    bit-for-bit on any engine/partitioning — a DuckDB oracle re-derives
    identical centroids. Shuffle ledger per iteration: ONE aggregate
    keyed (centroid, dim) + one k×dim regroup; empty clusters drop
    (standard Lloyd behavior).

    Returns (id_col, vec_col) centroids in the input's float domain,
    directly consumable by ivf_assign / ivf_cosine_topk.

    Delegates to :func:`kmeans_train_rows` (one job per iteration,
    bit-identical output — pinned by test) whenever the centroid table
    fits comfortably on the driver; :func:`_kmeans_train_df` remains
    the path for centroid tables too large to hold (k × dim beyond
    ~10⁶ entries)."""
    first = corpus.select(vec_col).first()
    dim = len(first[0]) if first is not None and first[0] is not None else None
    if dim is not None and k * dim <= 1_000_000 and _integral_id(corpus, id_col):
        rows = kmeans_train_rows(
            corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col, quantize=quantize
        )
        return corpus.sparkSession.createDataFrame(
            [(cid, vec) for cid, vec in rows],
            f"{id_col} long, {vec_col} array<double>",
        )
    return _kmeans_train_df(corpus, k, iters, id_col, vec_col, quantize)


def _kmeans_train_df(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    quantize: int,
) -> DataFrame:
    """The all-DataFrame Lloyd loop (see :func:`kmeans_train`): the
    scale path for centroid tables too large to hold on the driver,
    and the parity reference the fast trainer is tested against."""
    # same NULL/NaN exclusion as kmeans_train_rows (parity twins must
    # see the same input rows)
    corpus = _finite_vectors(corpus, vec_col).where(F.col(id_col).isNotNull())
    cents = corpus.orderBy(F.col(id_col).asc()).limit(k).select(id_col, vec_col)
    for _ in range(iters):
        assign = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col,
                            quantize=quantize, n_probe=1)
        qv = spread(corpus).select(F.col(id_col), _quantized(F.col(vec_col), quantize).alias("__q"))
        comp = assign.join(qv, id_col).select(
            "centroid_id", F.posexplode("__q").alias("dim", "val")
        )
        means = comp.groupBy("centroid_id", "dim").agg(
            F.sum("val").alias("__s"), F.count("*").alias("__c")
        )
        cents = (
            means.select(
                "centroid_id", "dim",
                F.round(F.col("__s") / F.col("__c")).cast("long").alias("__cc"),
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "__cc"))),
                    lambda st: st["__cc"] / quantize,
                ).alias(vec_col)
            )
            .select(F.col("centroid_id").alias(id_col), vec_col)
        )
    return cents


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer
    (centroids = the ``n_centroids`` lowest-id corpus vectors; swap in
    sampled/trained centroids at scale) partitions the corpus into
    inverted lists; each query probes its ``n_probe`` nearest lists and
    ranks exactly within them.

    Candidate generation is an equi-join on ``centroid_id`` — the
    100 TB path: cost scales with corpus/n_centroids × n_probe, not
    corpus × queries. Fully deterministic, so it oracle-checks. Pass
    ``centroids`` (e.g. from :func:`kmeans_train`) to override the
    seed quantizer."""
    # NULL/NaN/zero-norm exclusion at entry (family contract, r17
    # self-review) — also keeps a poisoned corpus head out of the
    # default centroid seed
    corpus = _finite_vectors(corpus, vec_col)
    queries = _finite_vectors(queries, vec_col)
    if centroids is None:
        centroids = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
    c_assign = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1).withColumnRenamed(
        id_col, "c_id"
    )
    q_assign = ivf_assign(queries, centroids, id_col, vec_col, n_probe=n_probe).withColumnRenamed(
        id_col, "q_id"
    )
    cand = (
        c_assign.join(F.broadcast(q_assign), "centroid_id")
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select("q_id", "c_id")
        .distinct()
    )

    cvec = corpus.select(
        F.col(id_col).alias("c_id"), _quantized(F.col(vec_col), 1_000_000).alias("c_vec")
    ).withColumn("c_n2", _dot(F.col("c_vec"), F.col("c_vec"), True))
    qvec = queries.select(
        F.col(id_col).alias("q_id"), _quantized(F.col(vec_col), 1_000_000).alias("q_vec")
    ).withColumn("q_n2", _dot(F.col("q_vec"), F.col("q_vec"), True))
    scored = (
        cand.join(cvec, "c_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            "c_id",
            _cosine(
                F.col("c_vec"), F.col("q_vec"), F.col("c_n2"), F.col("q_n2"), True
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    quantize: int = 1_000_000,
    barrier: bool = True,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    per query, take the ``pool`` most-relevant candidates by cosine,
    then greedily select ``k`` maximizing
    ``lam * relevance(c) − (1−lam) * max_sim(c, already_selected)`` —
    the standard RAG-retrieval diversification that stops near-duplicate
    passages from crowding the context window.

    Determinism/oracle contract: relevance and candidate-candidate
    similarities are the 6-dp-rounded quantized cosines every other
    sim op uses; the MMR score combines them with two double
    multiplications (identical IEEE on any engine) and ties break on
    candidate id — so the greedy sequence is SQL-unrollable and
    bit-reproducible.

    Scale shape: stage 1 is :func:`cosine_topk` (corpus never
    shuffles); stage 2's pairwise similarity is pool × pool PER QUERY
    (an equi-join on q_id, never corpus-quadratic); the greedy loop
    runs k−1 fixed iterations of a tiny join + argmax aggregate on
    ≤ queries × pool rows. Returns (q_id, c_id, cosine, step) with
    step = 1-based selection order."""
    query_id_col = query_id_col or id_col
    # lazy barrier (r17): rel feeds THREE consumer chains — the step-1
    # seed, the per-iteration `remaining` anti-join chain, and the
    # pool-vector join below. Without it every greedy step re-executed
    # the whole corpus top-k scan (~5-6 full passes, measured 11 s vs
    # 5 s at sf0.1); after it the top-k pass runs ONCE and every
    # consumer reads the (queries x pool)-row checkpoint.
    # ``barrier=False`` is the plan-audit twin (result-identical, fully
    # lazy) — the repo-wide convention tools/plan_report.py probes for.
    bar = (lambda df: df.localCheckpoint(eager=False)) if barrier else (lambda df: df)
    rel = bar(cosine_topk(
        corpus, queries, k=pool, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, quantize=quantize,
    ).select("q_id", "c_id", "cosine", "rank"))
    # pool-member vectors once; pairwise sims within each query's pool.
    # The pool-id semi join runs BEFORE the quantizer (r17): only the
    # <= queries x pool distinct pool members pay the per-component
    # quantize + dot, not the whole corpus (the ids broadcast off the
    # checkpointed rel). _finite_vectors still guards the join input —
    # pool members are clean by cosine_topk's contract, but the
    # contract lives in one place (r17 self-review: one NaN component
    # anywhere in a scanned row is an ANSI long-cast task killer).
    pool_ids = rel.select(F.col("c_id").alias("__id")).distinct()
    vecs = (
        _finite_vectors(corpus, vec_col)
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__raw"))
        .join(F.broadcast(pool_ids), "__id")
        .select("__id", _quantized(F.col("__raw"), quantize).alias("__v"))
        .withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True))
    )
    p = rel.join(vecs, rel.c_id == vecs.__id).select("q_id", "c_id", "__v", "__n2")
    a = p.select("q_id", F.col("c_id").alias("a_id"), F.col("__v").alias("__av"), F.col("__n2").alias("__an2"))
    b = p.select("q_id", F.col("c_id").alias("b_id"), F.col("__v").alias("__bv"), F.col("__n2").alias("__bn2"))
    sims = (
        a.join(b, "q_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "q_id", "a_id", "b_id",
            _cosine(F.col("__av"), F.col("__bv"), F.col("__an2"), F.col("__bn2"), True).alias("sim"),
        )
    )
    sims = bar(sims)
    lam_c, div_c = F.lit(float(lam)), F.lit(1.0 - float(lam))
    selected = rel.filter(F.col("rank") == 1).select(
        "q_id", "c_id", "cosine", F.lit(1).cast("long").alias("step")
    )
    remaining = rel.filter(F.col("rank") > 1).select("q_id", "c_id", "cosine")
    sims2 = sims.select(
        "q_id", F.col("a_id").alias("c_id"), F.col("b_id").alias("s_id"), "sim"
    )
    for s in range(2, k + 1):
        msim = (
            remaining.select("q_id", "c_id")
            .join(selected.select("q_id", F.col("c_id").alias("s_id")), "q_id")
            .join(sims2, ["q_id", "c_id", "s_id"])
            .groupBy("q_id", "c_id")
            .agg(F.max("sim").alias("msim"))
        )
        scored = remaining.join(msim, ["q_id", "c_id"]).withColumn(
            "score", lam_c * F.col("cosine") - div_c * F.col("msim")
        )
        pick = scored.groupBy("q_id").agg(
            F.max_by(
                F.struct("c_id", "cosine"),
                F.struct(F.col("score"), (-F.col("c_id")).alias("__nc")),
            ).alias("__p")
        ).select(
            "q_id", F.col("__p.c_id").alias("c_id"), F.col("__p.cosine").alias("cosine"),
            F.lit(s).cast("long").alias("step"),
        )
        selected = bar(selected.unionByName(pick))
        remaining = remaining.join(
            pick.select("q_id", "c_id"), ["q_id", "c_id"], "left_anti"
        )
    return selected


def plane_sign(plane: int, d: int) -> int:
    """±1 component d of hyperplane ``plane``: parity of the first hex
    nibble of md5(f"{plane}_{d}") — no RNG, identical in any engine
    that has md5 (the DuckDB oracle re-derives the same matrix)."""
    import hashlib

    nibble = int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[0], 16)
    return 1 if nibble & 1 else -1


def plane_signs(n_tables: int, n_planes: int, dim: int) -> list[list[list[int]]]:
    """signs[table][plane] = ±1 vector of length ``dim``. Pure
    constants — computed once on the driver, inlined as literals."""
    return [
        [[plane_sign(t * n_planes + p, d) for d in range(dim)] for p in range(n_planes)]
        for t in range(n_tables)
    ]


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
    n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic random-hyperplane LSH: bit i of a table's bucket
    id is the sign of ⟨v, r_i⟩ where r_i has ±1 components derived
    from md5(plane, dim) — no RNG, reproducible everywhere.

    With ``dim`` given, the ±1 matrices are precomputed on the driver
    and inlined as literal arrays, so each plane dot is a single
    ``zip_with``+``aggregate`` over constants (the md5 calls are per
    (plane, component) constants — never per row). Without ``dim``
    the same parities are derived in-expression (schema-agnostic
    fallback; identical buckets either way).

    With ``n_tables`` > 1 each vector gets one bucket per independent
    table (planes salted by table index) — standard multi-table recall
    amplification: neighbors are candidates if they collide in ANY
    table (P = 1-(1-p^planes)^tables). Returns (id, table, bucket).

    NULL embeddings are EXCLUDED (r16 self-review): with ``dim`` set a
    NULL vector made size() NULL, fell to the raise_error branch, and
    killed the job with a NULL (message-less) error; without ``dim``
    every plane dot went NULL and ALL null-vector rows funneled into
    bucket 0 of every table — an O(n_nulls²·tables) candidate blowup
    feeding NULL-cosine edges into knn_graph/lsh_cosine_topk.
    NaN-component vectors are excluded too (r17 self-review): the
    bucket quantizer's ANSI long cast killed the whole bucketing pass
    on the first NaN."""
    df = _finite_vectors(df, vec_col)
    q = _quantized(F.col(vec_col), quantize)
    if dim is not None:
        # Fail loudly on a dimension mismatch: with the inlined plane
        # matrices, a wrong ``dim`` makes zip_with pad with NULLs, every
        # plane dot goes NULL, and every vector lands in bucket 0 of
        # every table — the candidate join silently degenerates to a
        # full cross product. A per-row size check is one comparison.
        q = F.when(F.size(F.col(vec_col)) == dim, q).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"hyperplane_lsh_buckets: dim={dim} but {vec_col} has length "
                    ),
                    F.size(F.col(vec_col)).cast("string"),
                )
            )
        )
    vecs = spread(df).select(F.col(id_col), q.alias("__q"))

    if dim is not None:
        signs = plane_signs(n_tables, n_planes, dim)

        # expressions built as SQL strings: constructing 64 F.lit()
        # columns per plane × 32 planes costs thousands of py4j
        # round-trips (~8 s of DRIVER time before a single task runs);
        # one F.expr per plane is a single call
        def sign_component(t: int, p: int, bit: int) -> Column:
            lst = ",".join(f"{s}L" for s in signs[t][p])
            dot = (
                f"aggregate(zip_with(__q, array({lst}), (x, s) -> x * s), "
                "0L, (acc, x) -> acc + x)"
            )
            return F.expr(f"IF({dot} > 0, {1 << bit}L, 0L)")

    else:

        def sign_component(t: int, p: int, bit: int) -> Column:
            plane = t * n_planes + p
            # ±1 per (plane, dim): parity of the first md5 hex nibble
            signed = F.zip_with(
                F.col("__q"),
                F.sequence(F.lit(0), F.size(F.col("__q")) - 1),
                lambda x, d: F.when(
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", F.lit(plane), d).cast("binary")), 1, 1
                        ),
                        16,
                        10,
                    )
                    .cast("int")
                    .bitwiseAND(F.lit(1))
                    == 1,
                    x,
                ).otherwise(-x),
            )
            dot = F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)
            return F.when(dot > 0, F.lit(1 << bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )

    tables = []
    for t in range(n_tables):
        bucket = None
        for p in range(n_planes):
            c = sign_component(t, p, p)
            bucket = c if bucket is None else (bucket + c)
        tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return vecs.select(F.col(id_col), F.explode(F.array(*tables)).alias("tb")).select(
        id_col, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket in ANY table
    (equi-join on (table, bucket) — the 100 TB path), then exact
    cosine rank within candidates. Recall tunes up with more tables /
    fewer planes; candidate cost with the opposite."""
    cb = hyperplane_lsh_buckets(corpus, n_planes, id_col, vec_col, n_tables=n_tables, dim=dim).withColumnRenamed(id_col, "c_id")
    qb = hyperplane_lsh_buckets(queries, n_planes, id_col, vec_col, n_tables=n_tables, dim=dim).withColumnRenamed(id_col, "q_id")
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select("q_id", "c_id")
        .distinct()
    )

    # norms precomputed ONCE per vector (the sibling ops' shared
    # _cosine shape): the inline form re-ran both O(dim) norm
    # aggregates for EVERY candidate pair — a corpus vector in p query
    # candidate sets paid its norm p times (r16 self-review)
    # _finite_vectors + n2 > 0: the family's exclusion contract (r17
    # self-review) — NaN killed the quantizer cast, zero-norm the
    # cosine division
    cvec = (
        _finite_vectors(corpus, vec_col)
        .select(
            F.col(id_col).alias("c_id"),
            _quantized(F.col(vec_col), 1_000_000).alias("c_vec"),
        )
        .withColumn("c_n2", _dot(F.col("c_vec"), F.col("c_vec"), True))
        .filter(F.col("c_n2") > 0)
    )
    qvec = (
        _finite_vectors(queries, vec_col)
        .select(
            F.col(id_col).alias("q_id"),
            _quantized(F.col(vec_col), 1_000_000).alias("q_vec"),
        )
        .withColumn("q_n2", _dot(F.col("q_vec"), F.col("q_vec"), True))
        .filter(F.col("q_n2") > 0)
    )
    scored = (
        cand.join(cvec, "c_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            "c_id",
            _cosine(
                F.col("c_vec"), F.col("q_vec"), F.col("c_n2"), F.col("q_n2"), True
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_graph(
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    quantize: int = 1_000_000,
    mutual: bool = False,
) -> DataFrame:
    """Approximate k-NN GRAPH: every corpus vector gets edges to its k
    most-cosine-similar LSH-candidate neighbors — the all-nodes-are-
    queries companion to :func:`lsh_cosine_topk` (which broadcasts a
    small query side and therefore cannot express a graph over the
    whole corpus). kNN graphs feed SemDeDup-style clustering, label
    propagation over embedding neighborhoods, and graph-based ANN
    indexes.

    Scale shape: NOTHING broadcasts — candidates come from the bucket
    SELF-join on (table, bucket) (same shape as the MinHash banded
    join: only same-bucket vectors pair up), exact integer cosine is
    computed on candidates only via two keyed joins back to the
    vectors, and the final rank is a window PARTITIONED by source node
    (never global). Deterministic md5-derived hyperplanes make the
    candidate set — and thus the whole "approximate" graph —
    reproducible on any engine, so it oracles exactly.

    Returns (src, dst, cosine, rank), rank 1..k per src; nodes whose
    buckets contain no other vector emit no edges (standard LSH recall
    contract — raise n_tables / lower n_planes for denser graphs).

    ``mutual=True`` keeps an edge only when BOTH endpoints rank each
    other in their top-k — the standard symmetrization that fragments
    the hub-dominated kNN digraph into meaningful neighborhoods before
    graph clustering. One extra self-semi-join on the edge key.

    Candidate scoring runs as an Arrow-batched numpy kernel when numpy
    is available (one ``einsum`` row-wise dot per batch instead of an
    interpreted per-element ``aggregate`` chain — the t_lm_score HOF
    lesson); the kernel emits ONLY the exact int64 dot, and the
    rounding/division stays a JVM expression, so both paths are
    bit-identical (pinned in tests and by the shared oracle)."""
    b = hyperplane_lsh_buckets(
        corpus, n_planes, id_col, vec_col, quantize=quantize, n_tables=n_tables, dim=dim
    )
    cand = (
        b.withColumnRenamed(id_col, "src")
        .join(b.withColumnRenamed(id_col, "dst"), ["table", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # _finite_vectors + n2 > 0 (r17 self-review): one NaN component
    # anywhere in the corpus killed the scoring quantizer; a zero-norm
    # vector that shared a bucket killed the cosine division — such
    # nodes have no defined-cosine edges and drop from the graph
    vec = _finite_vectors(corpus, vec_col).select(
        F.col(id_col).alias("__id"), _quantized(F.col(vec_col), quantize).alias("__v")
    ).withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True)).filter(F.col("__n2") > 0)
    s = vec.select(
        F.col("__id").alias("src"), F.col("__v").alias("s_v"), F.col("__n2").alias("s_n2")
    )
    d = vec.select(
        F.col("__id").alias("dst"), F.col("__v").alias("d_v"), F.col("__n2").alias("d_n2")
    )
    paired = cand.join(s, "src").join(d, "dst")
    try:
        import numpy as np  # noqa: F401

        have_np = True
    except ImportError:  # pragma: no cover - numpy is baked in here
        have_np = False
    if have_np:
        fields = paired.select("src", "dst", "s_n2", "d_n2").schema.fieldNames()
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in paired.schema.fields
            if f.name in fields
        ) + ", dot long"

        def _score(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sv = np.stack(pdf["s_v"].to_numpy()).astype(np.int64)
                dv = np.stack(pdf["d_v"].to_numpy()).astype(np.int64)
                out = pdf[["src", "dst", "s_n2", "d_n2"]].copy()
                out["dot"] = np.einsum("ij,ij->i", sv, dv)
                yield pd.DataFrame(out)

        with_dot = paired.mapInPandas(_score, schema=out_schema)
    else:
        with_dot = paired.select(
            "src", "dst", "s_n2", "d_n2", _dot(F.col("s_v"), F.col("d_v"), True).alias("dot")
        )
    scored = with_dot.select(
        "src",
        "dst",
        F.round(
            F.col("dot") / F.sqrt(F.col("s_n2").cast("double") * F.col("d_n2").cast("double")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst").asc())
    g = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    if mutual:
        rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        g = g.join(rev, ["src", "dst"], "left_semi")
    return g


# ---------------------------------------------------------------------------
# product quantization (PQ): per-subspace codebooks + ADC scan
# ---------------------------------------------------------------------------


def _sub(vec: Column, s: int, sub_dim: int) -> Column:
    return F.slice(vec, s * sub_dim + 1, sub_dim)


def _l2_assign(vecs: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest codebook entry per vector by EXACT integer squared-L2:
    d² = |v|² − 2⟨v,c⟩ + |c|² — every term int64, so the argmin (and
    therefore the whole trained codebook) is bit-reproducible on any
    engine with no rounding step at all. Codebook broadcast; ties
    break (d² asc, code asc). ``vecs``: (id, __v, __n2); ``cents``:
    (code, __c, __cn2)."""
    one = _pair_key  # NULL-safe, non-foldable (r16; see its docstring)
    scored = (
        vecs.withColumn("__one", one(id_col))
        .join(F.broadcast(cents.withColumn("__one", one("code"))), "__one")
        .select(
            id_col,
            "code",
            (
                F.col("__n2")
                - F.lit(2) * _dot(F.col("__v"), F.col("__c"), True)
                + F.col("__cn2")
            ).alias("__d2"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(), F.col("code").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(id_col, "code")
    )


def pq_train_rows(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> list[tuple[int, int, list[int], int]]:
    """:func:`pq_train` with the codebooks held on the DRIVER (the PQ
    codebook is definitionally RAM-sized — m × n_codes × dim/m ints;
    FAISS keeps exactly this in memory), cutting training to ONE Spark
    job per Lloyd iteration for ALL subspaces at once: an Arrow-batched
    numpy stage slices each batch into subspaces, assigns by exact
    int64 squared-L2 (argmin-first over ascending codes == the
    (d² asc, code asc) tie-break — no rounding anywhere in the metric),
    and emits per-partition (subspace, code, dim) integer partial sums;
    one tiny aggregate + the same in-Spark rounded division produce the
    means. Associative int64 partials ⇒ partitioning-independent and
    bit-identical to the DataFrame trainer (pinned by test).

    Returns [(subspace, code, components list[int], cn2)] sorted."""
    import numpy as np
    import pandas as pd

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    # same NULL/NaN gate as kmeans_train_rows: NULL ids seed first and
    # crash int(r[0]); NULL embeddings crash the executor stack; NaN
    # components silently train garbage codewords via NaN.astype(int64)
    corpus = _finite_vectors(corpus, vec_col).where(F.col(id_col).isNotNull())
    seed = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_codes)
        .select(id_col, vec_col)
        .collect()
    )
    # quantize seeds driver-side with the exact F.round twin
    books: list[dict[int, list[int]]] = []
    for s in range(m):
        cb = {}
        for r in seed:
            cb[int(r[0])] = [
                _round_half_up(float(x) * quantize)
                for x in r[1][s * sub_dim : (s + 1) * sub_dim]
            ]
        books.append(cb)
    spark = corpus.sparkSession
    # no spread(): vectorized-matmul stage — see kmeans_train_rows
    base = corpus.select(_as_double(F.col(vec_col)).alias("__dv"))
    for _ in range(iters):
        packed = [
            (
                np.asarray(sorted(cb), dtype=np.int64),
                np.asarray([cb[c] for c in sorted(cb)], dtype=np.int64),
            )
            for cb in books
        ]
        bc = spark.sparkContext.broadcast(packed)

        def partials(batches, _bc=bc):
            pk = _bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                Q = _np_quant(np.stack(pdf["__dv"].to_numpy()), quantize)
                frames = []
                for s, (codes, C) in enumerate(pk):
                    Qs = Q[:, s * sub_dim : (s + 1) * sub_dim]
                    n2 = (Qs * Qs).sum(axis=1)
                    cn2 = (C * C).sum(axis=1)
                    d2 = n2[:, None] - 2 * (Qs @ C.T) + cn2[None, :]
                    a = codes[np.argmin(d2, axis=1)]
                    for code in np.unique(a):
                        members = Qs[a == code]
                        frames.append(
                            pd.DataFrame(
                                {
                                    "subspace": np.full(sub_dim, s, dtype=np.int32),
                                    "code": np.full(sub_dim, code, dtype=np.int64),
                                    "dim": np.arange(sub_dim, dtype=np.int64),
                                    "val": members.sum(axis=0),
                                    "cnt": np.full(sub_dim, len(members), dtype=np.int64),
                                }
                            )
                        )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        rows = (
            base.mapInPandas(
                partials, "subspace int, code long, dim long, val long, cnt long"
            )
            .groupBy("subspace", "code", "dim")
            .agg(F.sum("val").alias("__s"), F.sum("cnt").alias("__c"))
            .select(
                "subspace",
                "code",
                "dim",
                F.round(F.col("__s") / F.col("__c")).cast("long").alias("__cc"),
            )
            .collect()
        )
        books = [dict() for _ in range(m)]
        acc: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for r in rows:
            acc.setdefault((int(r["subspace"]), int(r["code"])), []).append(
                (int(r["dim"]), int(r["__cc"]))
            )
        for (s, code), comps in acc.items():
            books[s][code] = [cc for _, cc in sorted(comps)]
    out = []
    for s in range(m):
        for code in sorted(books[s]):
            comps = books[s][code]
            out.append((s, code, comps, sum(c * c for c in comps)))
    return out


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces of ``dim/m`` components; each subspace trains
    its own ``n_codes``-entry codebook by deterministic Lloyd
    iterations (seed = the n_codes lowest-id subvectors, integer-L2
    assignment via :func:`_l2_assign`, exact int64 component means
    rounded once — the :func:`kmeans_train` recipe per subspace, so a
    DuckDB oracle re-derives identical codebooks).

    Returns (subspace, code, __c array<long>, __cn2 long) in the
    quantized domain. Scale shape per subspace and iteration: one
    broadcast-codebook assignment over the corpus (map-only), one
    (code, dim) hash aggregate — the corpus never shuffles.

    Delegates to :func:`pq_train_rows` (one job per iteration for all
    subspaces, bit-identical — pinned by test) whenever the codebook
    fits the driver; the all-DataFrame loop remains the reference and
    the path for outsized codebooks."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    # NULL/NaN exclusion (r17 self-review): the expression path dies
    # at the ANSI long cast; the numpy path silently trains garbage
    # codewords from NaN.astype(int64)
    corpus = _finite_vectors(corpus, vec_col)
    if m * n_codes * (dim // m) <= 1_000_000 and _integral_id(corpus, id_col):
        rows = pq_train_rows(
            corpus, dim, m, n_codes, iters, id_col, vec_col, quantize
        )
        return corpus.sparkSession.createDataFrame(
            rows, "subspace int, code long, __c array<long>, __cn2 long"
        )
    return _pq_train_df(corpus, dim, m, n_codes, iters, id_col, vec_col, quantize)


def _pq_train_df(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """The all-DataFrame per-subspace Lloyd loop (see :func:`pq_train`)."""
    sub_dim = dim // m
    parts = []
    for s in range(m):
        sl = (
            spread(corpus)
            .select(
                F.col(id_col),
                _quantized(_sub(F.col(vec_col), s, sub_dim), quantize).alias("__v"),
            )
            .withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True))
        )
        cents = (
            sl.orderBy(F.col(id_col).asc())
            .limit(n_codes)
            .select(F.col(id_col).alias("code"), F.col("__v").alias("__c"), F.col("__n2").alias("__cn2"))
        )
        for _ in range(iters):
            assign = _l2_assign(sl, cents, id_col)
            comp = assign.join(sl.select(id_col, "__v"), id_col).select(
                "code", F.posexplode("__v").alias("dim", "val")
            )
            means = comp.groupBy("code", "dim").agg(
                F.sum("val").alias("__s"), F.count("*").alias("__cnt")
            )
            cents = (
                means.select(
                    "code",
                    "dim",
                    F.round(F.col("__s") / F.col("__cnt")).cast("long").alias("__cc"),
                )
                .groupBy("code")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "__cc"))),
                        lambda st: st["__cc"],
                    ).alias("__c")
                )
                .withColumn("__cn2", _dot(F.col("__c"), F.col("__c"), True))
            )
        parts.append(cents.select(F.lit(s).alias("subspace"), "code", "__c", "__cn2"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """Encode every vector as its nearest codebook entry per subspace:
    (id, subspace, code) — the PQ code table. At production scale this
    is the whole point: m small codes replace the raw vector (with
    256-entry codebooks, m bytes per vector — a 100 TB float corpus
    compresses to the point where the ADC scan is CPU-bound, not
    IO-bound). Encoding is map-only; the corpus never shuffles: the
    fast path collects the (RAM-sized) codebooks once and encodes all
    m subspaces in ONE Arrow-batched numpy pass (exact int64 L2,
    argmin-first == the (d² asc, code asc) tie-break — bit-identical
    to the broadcast-join path, pinned by test)."""
    import numpy as np
    import pandas as pd

    # NULL/NaN exclusion (r17 self-review): NULL vectors crash
    # np.stack, a NaN component encodes to a garbage int64 code
    # silently on the numpy path and kills the expression path's cast
    corpus = _finite_vectors(corpus, vec_col)
    sub_dim = dim // m
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if isinstance(
        corpus.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        cb_rows = codebooks.select("subspace", "code", "__c").collect()
        packed_d: dict[int, dict[int, list[int]]] = {}
        for r in cb_rows:
            packed_d.setdefault(int(r["subspace"]), {})[int(r["code"])] = [
                int(x) for x in r["__c"]
            ]
        packed = [
            (
                np.asarray(sorted(packed_d[s]), dtype=np.int64),
                np.asarray(
                    [packed_d[s][c] for c in sorted(packed_d[s])], dtype=np.int64
                ),
            )
            for s in range(m)
        ]
        bc = corpus.sparkSession.sparkContext.broadcast(packed)

        def encode(batches):
            pk = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                ids = pdf["__id"].to_numpy(dtype=np.int64)
                Q = _np_quant(np.stack(pdf["__dv"].to_numpy()), quantize)
                frames = []
                for s, (codes, C) in enumerate(pk):
                    Qs = Q[:, s * sub_dim : (s + 1) * sub_dim]
                    n2 = (Qs * Qs).sum(axis=1)
                    cn2 = (C * C).sum(axis=1)
                    d2 = n2[:, None] - 2 * (Qs @ C.T) + cn2[None, :]
                    frames.append(
                        pd.DataFrame(
                            {
                                id_col: ids,
                                "subspace": np.full(len(ids), s, dtype=np.int32),
                                "code": codes[np.argmin(d2, axis=1)],
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        # no spread(): vectorized-matmul stage — see kmeans_train_rows
        return (
            corpus
            .select(
                F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__dv")
            )
            .mapInPandas(encode, f"{id_col} long, subspace int, code long")
        )
    parts = []
    for s in range(m):
        sl = (
            spread(corpus)
            .select(
                F.col(id_col),
                _quantized(_sub(F.col(vec_col), s, sub_dim), quantize).alias("__v"),
            )
            .withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True))
        )
        cb = codebooks.filter(F.col("subspace") == s).select("code", "__c", "__cn2")
        parts.append(
            _l2_assign(sl, cb, id_col).select(
                id_col, F.lit(s).alias("subspace"), "code"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    k: int = 5,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
    refine: int | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC,
    public method: Jégou/Douze/Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): train PQ codebooks, encode
    the corpus once, then score every (query, vector) pair as the
    cosine between the query and the vector's RECONSTRUCTION —
    ⟨q, x̂⟩ = Σ_s table_s[code_s(x)] where each per-query lookup table
    holds the query-subvector · codebook-entry dots (exact int64).

    Scale shape: the lookup tables (queries × m × n_codes rows) and
    query norms broadcast; the code table joins them map-side and one
    (q_id, c_id) hash aggregate sums the m per-subspace terms —
    against the raw corpus an ADC scan reads m codes per vector
    instead of dim floats. Fully deterministic → fully oracled
    (``sim_pq_topk``); returns (q_id, c_id, cosine_pq, rank ≤ k).

    ``refine=R`` runs the standard two-stage recipe: the ADC scan
    shortlists R candidates per query, then ONLY those (q, c) pairs
    are re-scored with the exact quantized cosine on the raw vectors
    (a semi-join-sized read — R rows per query, never the corpus) and
    re-ranked to k. Returns (q_id, c_id, cosine, rank ≤ k) — exact
    scores over PQ-approximate candidates."""
    cb = pq_train(
        corpus, dim, m, n_codes, iters, id_col, vec_col, quantize
    ).localCheckpoint(eager=True)
    codes = pq_encode(corpus, cb, dim, m, id_col, vec_col, quantize)
    return _adc_topk(
        codes, cb, queries, corpus, dim, m, k, id_col, vec_col, quantize, refine
    )


def _adc_topk(
    codes: DataFrame,
    cb: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    m: int,
    k: int,
    id_col: str,
    vec_col: str,
    quantize: int,
    refine: int | None,
) -> DataFrame:
    """ADC ranking over a prebuilt (codes, codebooks) pair — shared by
    :func:`pq_cosine_topk` (which trains then scores) and
    :class:`PQStore` (which scores against persisted state). ``corpus``
    is touched only when ``refine`` re-ranks the shortlist exactly."""
    # NULL/NaN query vectors excluded (r17 self-review — the lookup
    # tables' quantizer cast was the first bomb); zero-norm queries
    # drop at the qn2 > 0 filter below
    queries = _finite_vectors(queries, vec_col)
    sub_dim = dim // m
    qparts = []
    for s in range(m):
        qparts.append(
            queries.select(
                F.col(id_col).alias("q_id"),
                F.lit(s).alias("subspace"),
                _quantized(_sub(F.col(vec_col), s, sub_dim), quantize).alias("__qs"),
            )
        )
    qsub = qparts[0]
    for p in qparts[1:]:
        qsub = qsub.unionByName(p)
    qtab = qsub.join(cb, "subspace").select(
        "q_id",
        "subspace",
        "code",
        _dot(F.col("__qs"), F.col("__c"), True).alias("__dt"),
        "__cn2",
    )
    qn2 = queries.select(
        F.col(id_col).alias("q_id"),
        _dot(
            _quantized(F.col(vec_col), quantize),
            _quantized(F.col(vec_col), quantize),
            True,
        ).alias("__qn2"),
    ).filter(F.col("__qn2") > 0)
    scored = (
        codes.withColumnRenamed(id_col, "c_id")
        .join(F.broadcast(qtab), ["subspace", "code"])
        .groupBy("q_id", "c_id")
        .agg(F.sum("__dt").alias("__adot"), F.sum("__cn2").alias("__rn2"))
        .join(F.broadcast(qn2), "q_id")
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select(
            "q_id",
            "c_id",
            # __rn2 = 0 (an all-zero reconstruction) has no defined
            # cosine; NULL ranks last instead of a task-killing ANSI
            # 0/0 — division stays INSIDE the when() branch
            F.when(
                F.col("__rn2") > 0,
                F.round(
                    F.col("__adot")
                    / F.sqrt(F.col("__rn2").cast("double") * F.col("__qn2").cast("double")),
                    6,
                ),
            ).alias("cosine_pq"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine_pq").desc(), F.col("c_id").asc())
    if refine is None:
        return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= refine)
        .select("q_id", "c_id")
    )
    cvec = _finite_vectors(corpus, vec_col).select(
        F.col(id_col).alias("c_id"), _quantized(F.col(vec_col), quantize).alias("c_vec")
    ).withColumn("c_n2", _dot(F.col("c_vec"), F.col("c_vec"), True)).filter(F.col("c_n2") > 0)
    qvec = queries.select(
        F.col(id_col).alias("q_id"), _quantized(F.col(vec_col), quantize).alias("q_vec")
    ).withColumn("q_n2", _dot(F.col("q_vec"), F.col("q_vec"), True)).filter(F.col("q_n2") > 0)
    exact = (
        cand.join(cvec, "c_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            "c_id",
            _cosine(
                F.col("c_vec"), F.col("q_vec"), F.col("c_n2"), F.col("q_n2"), True
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return exact.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
) -> DataFrame:
    """IVF + PQ — the production ANN composition (FAISS's IVFPQ index,
    public architecture from Jégou et al. 2011): a coarse quantizer
    partitions the corpus into inverted lists, and within the
    ``n_probe`` lists a query probes, scoring happens in the
    COMPRESSED domain (ADC over each vector's m codes). At 100 TB both
    factors matter: the probe touches corpus/n_centroids × n_probe of
    the lists, and what it reads per vector is m codes, not dim
    floats.

    Candidate generation is the IVF equi-join on centroid_id
    (q_assign broadcast); ADC scoring joins the candidates' code rows
    with the broadcast per-query lookup tables and sums the m terms in
    one (q_id, c_id) aggregate. Deterministic end to end → fully
    oracled (``sim_ivfpq_topk``)."""
    # NULL/NaN exclusion at entry (family contract, r17 self-review)
    corpus = _finite_vectors(corpus, vec_col)
    queries = _finite_vectors(queries, vec_col)
    centroids = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
    c_assign = ivf_assign(corpus, centroids, id_col, vec_col, quantize, n_probe=1).withColumnRenamed(
        id_col, "c_id"
    )
    q_assign = ivf_assign(queries, centroids, id_col, vec_col, quantize, n_probe=n_probe).withColumnRenamed(
        id_col, "q_id"
    )
    cand = (
        c_assign.join(F.broadcast(q_assign), "centroid_id")
        .filter(~F.col("c_id").eqNullSafe(F.col("q_id")))
        .select("q_id", "c_id")
        .distinct()
    )

    cb = pq_train(
        corpus, dim, m, n_codes, iters, id_col, vec_col, quantize
    ).localCheckpoint(eager=True)
    codes = pq_encode(corpus, cb, dim, m, id_col, vec_col, quantize)

    sub_dim = dim // m
    qparts = []
    for s in range(m):
        qparts.append(
            queries.select(
                F.col(id_col).alias("q_id"),
                F.lit(s).alias("subspace"),
                _quantized(_sub(F.col(vec_col), s, sub_dim), quantize).alias("__qs"),
            )
        )
    qsub = qparts[0]
    for p in qparts[1:]:
        qsub = qsub.unionByName(p)
    qtab = qsub.join(cb, "subspace").select(
        "q_id",
        "subspace",
        "code",
        _dot(F.col("__qs"), F.col("__c"), True).alias("__dt"),
        "__cn2",
    )
    qn2 = queries.select(
        F.col(id_col).alias("q_id"),
        _dot(
            _quantized(F.col(vec_col), quantize),
            _quantized(F.col(vec_col), quantize),
            True,
        ).alias("__qn2"),
    ).filter(F.col("__qn2") > 0)
    scored = (
        codes.withColumnRenamed(id_col, "c_id")
        .join(cand, "c_id")  # restrict ADC to the probed lists
        .join(F.broadcast(qtab), ["q_id", "subspace", "code"])
        .groupBy("q_id", "c_id")
        .agg(F.sum("__dt").alias("__adot"), F.sum("__cn2").alias("__rn2"))
        .join(F.broadcast(qn2), "q_id")
        .select(
            "q_id",
            "c_id",
            # same zero-reconstruction guard as _adc_topk
            F.when(
                F.col("__rn2") > 0,
                F.round(
                    F.col("__adot")
                    / F.sqrt(F.col("__rn2").cast("double") * F.col("__qn2").cast("double")),
                    6,
                ),
            ).alias("cosine_pq"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine_pq").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


class PQStore:
    """Persisted PQ index — the embedding analogue of
    ``dedup.SignatureStore``: codebooks are trained ONCE and then
    frozen; the code table is a keyed, upsertable lake table. New
    embeddings arriving later are encoded against the frozen codebooks
    (m broadcast assignments — the corpus is never re-encoded, the
    codebooks never retrained) and key-upserted, so index maintenance
    is O(delta) per batch; with ``buckets`` the code-table merge also
    rewrites only touched key-hash partitions.

    The 100 TB math: with 256-entry codebooks the codes are m bytes
    per vector — a float corpus compresses ~dim·4/m ×, and the
    steady-state ANN scan (:meth:`topk`) reads codes + codebooks only,
    touching raw vectors just for an optional exact re-rank of the
    shortlist. Everything is deterministic, so a store-backed query
    oracle-checks identically to the train-inline path
    (``sim_pq_store_topk``)."""

    def __init__(
        self,
        spark,
        path: str,
        dim: int,
        m: int = 4,
        n_codes: int = 8,
        iters: int = 1,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        quantize: int = 1_000_000,
        buckets: int | None = None,
        retain: int = 0,
    ):
        from ..sources.lake import LakeTable

        self.spark = spark
        self.dim, self.m, self.n_codes, self.iters = dim, m, n_codes, iters
        self.id_col, self.vec_col, self.quantize = id_col, vec_col, quantize
        path = path.rstrip("/")
        self.cb_table = LakeTable(spark, path + "/codebooks")
        self.codes_table = LakeTable(
            spark, path + "/codes", index=id_col, buckets=buckets, retain=retain
        )

    def exists(self) -> bool:
        return self.cb_table.exists() and self.codes_table.exists()

    def build(self, corpus: DataFrame) -> None:
        """Train codebooks on ``corpus`` and encode it — the one-time
        job every later :meth:`ingest` amortizes."""
        from ..sources.sql import SaveStrategy

        cb = pq_train(
            corpus, self.dim, self.m, self.n_codes, self.iters,
            self.id_col, self.vec_col, self.quantize,
        ).localCheckpoint(eager=True)
        self.cb_table.save(cb, SaveStrategy.REPLACE)
        self.codes_table.save(
            pq_encode(corpus, cb, self.dim, self.m, self.id_col, self.vec_col, self.quantize),
            SaveStrategy.REPLACE,
        )

    def codebooks(self) -> DataFrame:
        return self.cb_table.read().df

    def codes(self) -> DataFrame:
        return self.codes_table.read().df

    def ingest(self, new: DataFrame) -> None:
        """Encode ``new`` against the FROZEN codebooks and key-upsert
        into the code table. Re-sent ids overwrite their own codes, so
        at-least-once replay is idempotent."""
        from ..sources.sql import SaveStrategy

        self.codes_table.save(
            pq_encode(new, self.codebooks(), self.dim, self.m,
                      self.id_col, self.vec_col, self.quantize),
            SaveStrategy.UPSERT,
        )

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        refine: int | None = None,
        corpus: DataFrame | None = None,
    ) -> DataFrame:
        """ADC top-k against the persisted index — no training, no
        corpus encode in the plan; raw vectors (``corpus``) are
        required and read only when ``refine`` re-ranks exactly."""
        if refine is not None and corpus is None:
            raise ValueError("refine requires the raw-vector corpus to re-rank")
        return _adc_topk(
            self.codes(), self.codebooks(), queries, corpus,
            self.dim, self.m, k, self.id_col, self.vec_col, self.quantize, refine,
        )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize: int = 1_000_000,
    with_sums: bool = False,
) -> DataFrame:
    """Exact integer Gram matrix ``G = Σ_rows q·qᵀ`` of the quantized
    embedding column — the one-corpus-pass reduction behind PCA,
    covariance analysis, and whitening at 100 TB: the corpus is read
    ONCE, each Arrow batch contributes a dim×dim partial via a single
    int64 matmul, and only dim² numbers ever aggregate.

    Exactness/overflow contract — ENFORCED at runtime (r13): vectors
    quantize JVM-side with the repo's engine-independent
    ``round(x·quantize)`` recipe, so Python sees only int64 arrays (no
    float rounding in the UDF). A per-batch partial is bounded by
    ``batch_rows · (quantize·max|x|)²``; each Arrow batch measures
    ``max|q|`` and, when the batch-level bound would exceed int64,
    splits the matmul into row chunks sized ``(2⁶³−1) // max|q|²`` so
    every emitted partial stays exact (numpy would otherwise WRAP
    int64 silently). The one unrepresentable case — a single row with
    ``max|q|² ≥ 2⁶³``, i.e. |x| ≳ 3000 at quantize=1e6 — raises a
    clear ValueError instead of corrupting G, as does a ragged
    embedding column (mixed array lengths). Partials aggregate as
    decimal(38,0), exact to ~1e38 total rows·energy (a 1e9-row corpus
    peaks around 1e21). Returns dim² rows (i, j, g) — metadata-sized
    by contract, like PQ codebooks.

    ``with_sums=True`` additionally emits the exact column sums as
    sentinel rows ``(i, -1, Σ q_i)`` and the row count as
    ``(-1, -1, n)`` — produced in the SAME pass (the batch already
    holds the matrix), so mean-centering (:func:`power_iteration_top`
    with ``sums``/``n``) costs no extra corpus read.

    Plan: one mapInPandas (Arrow-batched matmul, the one place Python
    touches data) + one (i, j) hash aggregate with map-side partials.
    No shuffle of the corpus itself."""
    q = df.where(F.col(vec_col).isNotNull()).select(
        _quantized(F.col(vec_col), quantize).alias("__q")
    )

    def _partials(batches):
        import numpy as np
        import pandas as pd

        i64_max = (1 << 63) - 1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = pdf["__q"].tolist()
            lens = {len(r) for r in rows}
            if len(lens) != 1:
                raise ValueError(
                    "gram_matrix: ragged embedding column — array lengths "
                    f"{sorted(lens)[:8]} in one batch; a Gram matrix needs a "
                    "fixed dimension (filter or pad upstream)"
                )
            m = np.array(rows, dtype=np.int64)
            amax = int(np.abs(m).max())
            if amax * amax > i64_max:
                raise ValueError(
                    f"gram_matrix: max|q| = {amax} makes even a single-row "
                    "partial exceed int64 (max|q|^2 >= 2^63); lower `quantize` "
                    "or rescale the embeddings (|x|*quantize must stay below "
                    "~3.04e9)"
                )
            # Chunk so every partial obeys rows_in_chunk * amax^2 <= int64
            # max — numpy int64 matmul wraps SILENTLY past that, and the
            # docstring bound is a promise, not a hope.
            step = len(m) if amax == 0 else max(1, i64_max // (amax * amax))
            for lo in range(0, len(m), step):
                c = m[lo : lo + step]
                g = c.T @ c
                d = g.shape[0]
                ii, jj = np.indices((d, d))
                i_col = ii.ravel().astype("int32")
                j_col = jj.ravel().astype("int32")
                g_col = g.ravel()
                if with_sums:
                    i_col = np.concatenate(
                        [i_col, np.arange(d, dtype="int32"), np.array([-1], "int32")]
                    )
                    j_col = np.concatenate(
                        [j_col, np.full(d, -1, "int32"), np.array([-1], "int32")]
                    )
                    g_col = np.concatenate(
                        [g_col, c.sum(axis=0), np.array([len(c)], dtype=np.int64)]
                    )
                yield pd.DataFrame({"i": i_col, "j": j_col, "g": g_col})

    parts = q.mapInPandas(_partials, "i int, j int, g long")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g")
    )


def collect_gram(gram_df: DataFrame) -> tuple[list[tuple[int, int, int]], list[int], int, int]:
    """Collect a :func:`gram_matrix` result (dim² metadata rows by
    contract) into ``(gram_rows, sums, n, dim)`` with ``dim`` DERIVED
    from the max index + 1 — callers stay dim-agnostic instead of
    hard-coding the corpus dimension (r12 verdict). ``sums``/``n``
    come from the ``with_sums=True`` sentinel rows and are zeros/0
    when the matrix was built without them."""
    rows: list[tuple[int, int, int]] = []
    sums_map: dict[int, int] = {}
    n = 0
    dim = 0
    for r in gram_df.collect():
        i, j, val = int(r["i"]), int(r["j"]), int(r["g"])
        if i == -1:
            n = val
        elif j == -1:
            sums_map[i] = val
            dim = max(dim, i + 1)
        else:
            rows.append((i, j, val))
            dim = max(dim, i + 1, j + 1)
    sums = [sums_map.get(i, 0) for i in range(dim)]
    return rows, sums, n, dim


def power_iteration_top(
    gram_rows: list[tuple[int, int, int]],
    dim: int,
    iters: int = 3,
    scale: int = 1_000_000,
    sums: list[int] | None = None,
    n: int | None = None,
) -> list[int]:
    """Top principal direction of an integer Gram matrix by a
    FIXED-iteration integer power method — the driver-side tail of
    :func:`gram_matrix` (the matrix is dim² metadata; the corpus never
    moves). Start vector ``v0_i = i + 1`` — deliberately NON-uniform:
    an all-ones start sits exactly in the centered matrix's null space
    whenever row sums are constant (the centering annihilates it), and
    a varied start has no such structural orthogonality. Each
    iteration is one exact mat-vec followed by integer renormalization
    ``v_i ← sign(w_i) · (|w_i|·scale) // max|w|`` (truncating division
    on non-negative operands — identical to SQL DIV), so every engine
    replaying the same iterations reproduces the vector bit for bit.
    Python ints are arbitrary-precision: no overflow at any corpus
    size. Returns the dim-length component, max-abs-normalized to
    ``scale``.

    With ``sums``/``n`` (the column sums and row count — gram_matrix's
    ``with_sums=True`` sentinels), the iteration runs on the CENTERED
    scatter matrix ``M = n·G − s·sᵀ = n² · Cov`` — the true principal
    component instead of the mean-dominated uncentered direction — via
    the factored mat-vec ``M·v = n·(G·v) − s·(sᵀ·v)`` (M itself is
    never materialized; same exact integers). The positive factor n²
    leaves the direction unchanged, so no division enters the loop."""
    G = [[0] * dim for _ in range(dim)]
    for i, j, g in gram_rows:
        if int(i) >= 0 and int(j) >= 0:
            G[int(i)][int(j)] = int(g)
    centered = sums is not None and n is not None
    s = [int(x) for x in sums] if centered else [0] * dim
    v = list(range(1, dim + 1))
    for _ in range(iters):
        gv = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        if centered:
            sv = sum(s[j] * v[j] for j in range(dim))
            w = [int(n) * gv[i] - s[i] * sv for i in range(dim)]
        else:
            w = gv
        m = max(abs(x) for x in w)
        if m == 0:  # zero matrix: direction undefined, report zeros
            return w
        v = [(1 if x >= 0 else -1) * ((abs(x) * scale) // m) for x in w]
    return v


def pca_project(
    df: DataFrame,
    component: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 1_000_000,
) -> DataFrame:
    """Project every embedding onto an integer component vector
    (:func:`power_iteration_top`'s artifact) — the downstream half of
    the PCA story: top-component scores feed drift monitors, coreset
    sampling, and 1-D indexes. The component rides as a literal array
    (≤ dim ints — plan metadata, no join), the dot is exact int64
    (|q|·|v|·dim ≤ ~3.4e13 at unit-scale embeddings — 5 orders under
    overflow), and one map-only pass emits (id_col, proj_q). NULL
    vectors are excluded like :func:`gram_matrix`."""
    comp = F.array(*[F.lit(int(x)).cast("long") for x in component])
    q = _quantized(F.col(vec_col), quantize)
    return df.where(F.col(vec_col).isNotNull()).select(
        id_col, _dot(q, comp, True).alias("proj_q")
    )
