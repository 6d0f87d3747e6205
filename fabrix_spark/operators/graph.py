"""Iterative graph operators over edge DataFrames.

PageRank is the classic crawl/corpus quality primitive (domain
authority for crawl prioritization, centrality of documents inside a
near-dup graph). The reference has no graph operator — this extends
the engine the same way dup_clusters (connected components,
dedup.py) already does, and shares its design constraints:

- **Deterministic integer arithmetic.** Ranks live in int64 units of
  1e-12 (``unit``), every division is integer division, and damping
  is a ×85 //100 integer step — so the result is bit-identical on any
  engine and any partitioning, and a DuckDB oracle can unroll the
  iterations as plain SQL. Float PageRank would drift in the last ulp
  per aggregation order and never hash-match.
- **Fixed iteration count**, not convergence-test-driven: the
  per-iteration plan is one equi-join (edges ⋈ ranks on src) + one
  aggregate (sum of contributions on dst) — both shuffle on the key,
  nothing collects to the driver except the one-time node count.

Semantics: r0(v) = unit // N;
r_{k+1}(v) = (unit // N) * (100-d) // 100  +  d * Σ_{u→v} (r_k(u) // outdeg(u)) // 100.
Dangling-node mass (sinks with no out-edges) is dropped by default —
the common simplification; ranks remain a deterministic partial
order, which is what selection/prioritization uses. Pass
``redistribute=True`` to spread each iteration's dangling sum
uniformly (one extra aggregate per iteration) when ranks must be a
proper distribution comparable across graphs. Integer floor division
also leaks ≤1 unit (1e-12) per division: deterministic on both
engines by construction.

100 TB shape: edges shuffle-partition on src once
(``edges_with_outdeg``), each iteration reuses that partitioning for
the join and shuffles contributions on dst; cost is
O(iters × |E|) with no quadratic term. For many iterations persist
the prepared edge set so Spark doesn't replay the scan per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_undirected", "pagerank"]


def to_undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize a directed edge list (each edge also reversed),
    deduplicated — turns PageRank into undirected random-walk
    centrality."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = False,
    redistribute: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) edge list.

    ``seeds`` (a one-column DataFrame of node ids) switches to
    PERSONALIZED PageRank: the teleport mass lands only on the seed
    set instead of uniformly — r0 and the per-iteration base term are
    ``unit // |seeds|`` for seeds and 0 elsewhere. The crawl-seeding /
    topic-conditioned-authority variant (rank "importance as seen from
    these trusted pages"); same per-iteration plan plus one broadcast
    semi-probe of the seed set.

    Returns (node, rank) for every node appearing in the edge list,
    rank in int64 ``unit`` fractions (divide by ``unit`` for the
    probability-like score). See the module docstring for the exact
    integer recurrence and determinism/scale contract.

    ``redistribute=True`` spreads each iteration's dangling mass (the
    summed rank of sink nodes, which the default semantics drop)
    uniformly: r_{k+1}(v) = base + (Σ contribs + dangling_sum // N)
    * d // 100 — ranks then stay a proper distribution (up to integer
    floor leakage), comparable ACROSS graphs. Cost: one extra
    aggregate per iteration producing a 1-row frame that broadcast-
    cross-joins into the update — no extra driver round-trip, and the
    recurrence stays SQL-unrollable.

    ``checkpoint=True`` localCheckpoints the prepared edge set, node
    set, and each iteration's ranks, truncating lineage so iteration
    k's plan is ONE join + ONE aggregate instead of a replay of every
    previous iteration's derivation — the right shape beyond 2-3
    iterations or when the edge list is itself a derived plan. Results
    are bit-identical either way (integer arithmetic)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one tiny driver scalar (like dup_clusters' per-iteration count):
    # N parameterizes the integer base rank
    if checkpoint:
        nodes = nodes.localCheckpoint()
    n = nodes.count()
    if seeds is not None:
        if redistribute:
            raise ValueError(
                "redistribute with seeds is unsupported: personalized "
                "dangling mass teleports to the seed set, not uniformly"
            )
        seed_col = seeds.columns[0]
        seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
        if checkpoint:
            seed_nodes = seed_nodes.localCheckpoint()
        n_seeds = seed_nodes.count()
        if n_seeds == 0:
            raise ValueError("personalized pagerank requires a non-empty seed set")
        nodes = nodes.join(F.broadcast(seed_nodes.withColumn("__seed", F.lit(1))), "node", "left")
        is_seed = F.coalesce(F.col("__seed"), F.lit(0)) == 1
        r0_col = F.when(is_seed, F.lit(unit // n_seeds)).otherwise(F.lit(0))
        base_col = F.when(
            is_seed, F.lit((unit // n_seeds) * (100 - damping_pct) // 100)
        ).otherwise(F.lit(0))
    else:
        r0_col = F.lit(unit // n)
        base_col = F.lit((unit // n) * (100 - damping_pct) // 100)
    e_deg = e.join(outdeg, "src")
    if checkpoint:
        e_deg = e_deg.localCheckpoint()
    ranks = nodes.select("node", r0_col.cast("long").alias("rank"))
    for _ in range(iters):
        contrib = e_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c")
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        if redistribute:
            # dangling mass: total rank sitting on nodes with no
            # out-edges this iteration — a 1-row aggregate broadcast
            # into the update (the smp_rebalance 1-row-table shape,
            # not a scale risk)
            dangling = ranks.join(
                outdeg.select(F.col("src").alias("node")), "node", "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dsum"))
            ranks = (
                nodes.join(sums, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        base_col
                        + F.expr(
                            f"(coalesce(s, 0L) + dsum div {n}) * {damping_pct} div 100"
                        )
                    ).cast("long").alias("rank"),
                )
            )
        else:
            ranks = nodes.join(sums, "node", "left").select(
                "node",
                (
                    base_col
                    + F.expr(f"coalesce(s, 0L) * {damping_pct} div 100")
                ).cast("long").alias("rank"),
            )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks
