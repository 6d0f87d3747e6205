#!/usr/bin/env python
"""Scaling-curve evidence for the LLM-pipeline operators.

Every 100 TB claim in this repo rests on plan-shape reading; this tool
converts the argument into measured data: it synthesizes deterministic
1×/3×/10× blow-ups of the sf0.1 ``documents``/``embeddings`` tables,
runs each headline LLM operator at every factor, and fits the runtime
exponent t ∝ m^e (e ≈ 1 ⇒ linear; the sf0.1 job floor pushes the
FITTED exponent BELOW 1, so e ≤ ~1.1 is the pass bar — any hidden
quadratic term would show e → 2 between 3× and 10×).

Synthesis keeps the WORK DENSITY constant per copy — the property that
makes the curve meaningful:

- documents: copy c of each doc suffixes every non-stopword token with
  ``_c`` (stopwords untouched). Within-copy duplicate structure and
  every text statistic the gates read (token counts, stopword ratios,
  language scores) are preserved exactly; across copies the shingle
  spaces are disjoint, so duplicate DENSITY stays constant instead of
  groups growing m-fold (which would measure the output blow-up, not
  the scan). doc_id stride is a multiple of 5, preserving the
  corpus/delta split of the incremental queries.
- embeddings: copy c applies a per-copy deterministic sign pattern to
  the components — an isometry, so within-copy geometry (cluster
  structure, cosine near-dups) is EXACTLY preserved, while cross-copy
  cosines collapse toward 0.
- the operators whose scale contract says "grow the index with the
  corpus" (SemDeDup k, IVF nlist — both documented in their
  docstrings) are run with k, nlist ∝ m; fixed-parameter operators run
  unchanged.

Usage: python tools/scaling_curve.py [--factors 1,3,10] [--runs 2]
Prints a markdown table (paste into BENCH_NOTES.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = "/tmp/fabrix_scale_cache"
STRIDE = 10_000_000  # multiple of 5: preserves doc_id % 5 splits


def _all_stopwords():
    from fabrix_spark.operators import text

    return sorted({w for ws in text.LANG_STOPWORDS.values() for w in ws})


def synthesize(spark, m: int) -> str:
    out = os.path.join(CACHE, f"x{m}")
    done = os.path.join(out, "_DONE_v2")  # v2: adds events.parquet
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    # events: copy c shifts event_id AND user_id by the stride —
    # disjoint key spaces, so per-key event density (what windowed /
    # as-of work scales on) stays constant per copy. Read through the
    # nanos-aware helper; written back as standard µs timestamps.
    from fabrix_spark.queries import _events

    ev = _events(spark, BASE)
    stop = F.array(*[F.lit(w) for w in _all_stopwords()])
    d_parts, e_parts, v_parts = [], [], []
    for c in range(m):
        if c == 0:
            d_parts.append(docs)
            e_parts.append(emb)
            v_parts.append(ev)
            continue
        v_parts.append(
            ev.select(
                (F.col("event_id") + F.lit(c * STRIDE)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(c * STRIDE)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x: F.when(F.array_contains(stop, x), x).otherwise(
                    F.concat(x, F.lit(f"_{c}"))
                ),
            ),
            " ",
        )
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * STRIDE)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # per-copy sign pattern: an isometry (within-copy geometry
        # exact), cross-copy cosines ~0
        signed = F.transform(
            F.col("embedding"),
            lambda x, i: x * F.when((i * (c + 1) + c) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).cast("float"),
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(c * STRIDE)).alias("vec_id"),
                signed.alias("embedding"),
                "label",
            )
        )
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    d.repartition(max(8, 4 * m)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e.repartition(max(4, 2 * m)).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    v = v_parts[0]
    for p in v_parts[1:]:
        v = v.unionByName(p)
    v.repartition(max(8, 4 * m)).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    open(done, "w").close()
    return out


def _with_straggler(spark, job_fn):
    """Run ``job_fn`` and return (result, max_task_duration_seconds)
    across the stages the job completed — the straggler metric that a
    skew-splitting salt is supposed to shrink even when total work
    (and thus wall-time) is unchanged. Uses the Spark UI REST API."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def _get(path):
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
            return json.load(r)

    try:
        before = {s["stageId"] for s in _get("/stages?status=complete")}
    except Exception:
        return job_fn(), float("nan")
    result = job_fn()
    mx = 0.0
    try:
        for s in _get("/stages?status=complete"):
            if s["stageId"] in before:
                continue
            sid, att = s["stageId"], s["attemptId"]
            ts = _get(f"/stages/{sid}/{att}/taskSummary?quantiles=1.0")
            mx = max(mx, float(ts["duration"][0]) / 1000.0)
    except Exception:
        return result, float("nan")
    return result, mx


def fit_exponent(ms, ts) -> float:
    xs = [math.log(m) for m in ms]
    ys = [math.log(t) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,3,10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--ops", default="", help="comma-separated name prefixes to run")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from fabrix_spark.operators import dedup, similarity
    from fabrix_spark.queries import REGISTRY, _prebuilt_sigstore
    from fabrix_spark.session import get_spark

    spark = get_spark("scaling_curve", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]", ui=True)
    dirs = {m: synthesize(spark, m) for m in factors}

    def run_registry(name):
        def op(sf_dir, m):
            return REGISTRY[name].fn(spark, sf_dir).count()

        return op

    def op_incremental_probe(sf_dir, m):
        # steady-state contract: store prebuilt outside the timed region
        return REGISTRY["d_incremental_probe"].fn(spark, sf_dir).count()

    def warm_incremental(sf_dir, m):
        _prebuilt_sigstore(spark, sf_dir)

    def op_semdedup(sf_dir, m):
        # paper contract (dedup.py docstring): k grows with the corpus
        # so per-cluster cardinality stays bounded
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return dedup.semantic_prune(emb, k=8 * m, iters=1, threshold=0.375).count()

    def op_ivfpq(sf_dir, m):
        # IVF contract: nlist grows with the corpus; n_probe fixed
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        queries = emb.filter(F.col("vec_id") < 8)
        return similarity.ivfpq_topk(
            emb, queries, dim=64, m=4, n_codes=8, k=5, n_centroids=16 * m, n_probe=2
        ).count()

    def op_stream_admission(sf_dir, m):
        # the per-batch O(delta) claim: 3 sequential admit_batch calls
        # (probe store -> verify -> fold in), corpus m×, batch m× —
        # linear total means each batch stayed O(its delta)
        import atexit
        import shutil
        import tempfile

        from fabrix_spark.operators import dedup as _dd
        from fabrix_spark.sources.lake import LakeTable
        from fabrix_spark.streaming.ingest import admit_batch

        root = tempfile.mkdtemp(prefix="fabrix_scale_adm_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        store = _dd.SignatureStore(spark, root + "/sigs", buckets=8)
        admitted = LakeTable(spark, root + "/admitted", index="doc_id", buckets=8)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        for b in range(3):
            admit_batch(
                docs.filter(F.col("doc_id") % 3 == b), store, admitted, threshold=0.2
            )
        return admitted.read().df.count()

    def op_fuzzy_join(sf_dir, m):
        # the admission-probe shape: the doc_id % 5 == 0 delta fuzzy-
        # probed against the % 5 != 0 corpus (the stride-preserving
        # split every incremental query uses) — linear total means the
        # per-probe work stayed bounded by blocking + banded verify
        from fabrix_spark.operators.dedup import fuzzy_join

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return fuzzy_join(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
        ).count()

    def _synth_edges(sf_dir):
        # m isomorphic per-copy graphs (3 deterministic out-edges per
        # doc, targets stay inside the copy's id block): edge count ∝ m
        # while per-node degree stays constant — the edge-table
        # multiplier the graph-family curves run on (derived from the
        # documents multiplier, so the cache needs no fourth table)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        base = F.floor(F.col("doc_id") / F.lit(STRIDE)) * F.lit(STRIDE)
        local = F.col("doc_id") % F.lit(STRIDE)
        edges = None
        for a, b in ((37, 11), (101, 3), (7919, 1)):
            part = docs.select(
                F.col("doc_id").alias("src"),
                (base + (local * a + b) % F.lit(5000)).alias("dst"),
            )
            edges = part if edges is None else edges.unionByName(part)
        return edges

    def op_pagerank(sf_dir, m):
        # the iterative join+aggregate path measured at growing |E|
        from fabrix_spark.operators.graph import pagerank

        return pagerank(
            _synth_edges(sf_dir), iters=3, redistribute=True, checkpoint=True
        ).count()

    def op_label_prop(sf_dir, m):
        # measures the per-round join+min-aggregate of the
        # Pregel-style min-label loop on the same |E| ∝ m graph
        from fabrix_spark.operators.graph import min_label_propagation

        return min_label_propagation(_synth_edges(sf_dir), iters=3).count()

    def op_k_core(sf_dir, m):
        # r14: the k_core curve the r13 verdict asked for — same
        # |E| ∝ m synthetic graph. k=4 makes round 1 peel every
        # 3-out-degree source whose id is not a hot target, so later
        # rounds run on the shrunken hot-target subgraph: the curve
        # measures the per-round degree aggregate + two semi-joins at
        # growing |E| (the operator's only corpus-sized work)
        from fabrix_spark.operators.graph import k_core

        return k_core(_synth_edges(sf_dir), k=4, iters=3).count()

    def op_k_core_stable(sf_dir, m):
        # the until_stable variant: adds one metadata count() per
        # round; rounds-to-fixpoint is a property of the (fixed)
        # per-copy graph shape, so round count stays constant in m and
        # the curve isolates the same per-round |E| term
        from fabrix_spark.operators.graph import k_core

        return k_core(
            _synth_edges(sf_dir), k=4, until_stable=True, max_rounds=30
        ).count()

    def op_asof(sf_dir, m):
        # union + one (by, time) sort-window as-of at m× events; user
        # keys disjoint per copy so per-key window size is constant
        from fabrix_spark.operators.temporal import asof_join

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        qs = F.sum(F.round(F.col("value") * 100).cast("long"))
        n = F.count("*")
        rates = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("ts")).agg(
            F.floor((2 * qs + n) / (2.0 * n)).cast("long").alias("hr_avg_cents")
        )
        return asof_join(
            ev.select("event_id", "event_type", "ts"),
            rates,
            on="ts",
            by=["event_type"],
            right_cols=["hr_avg_cents"],
        ).count()

    def op_jaccard_prefix(sf_dir, m):
        from fabrix_spark.operators import dedup

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup.jaccard_pairs(docs, threshold=0.2, method="prefix").count()

    # r10: the hot-LSH-bucket salt, MEASURED (r9 pinned pair-set
    # equality only). Pathological corpus: every doc identical, so all
    # 500m docs collapse into ONE bucket per band and pair generation
    # is C(500m, 2) comparisons. Unsalted, that lands on a single task
    # (AQE refuses both-sides-skewed self-joins); salt=8 spreads it
    # over 8 chunks. Total work is identical — the contrast isolates
    # the straggler: unsalted wall-time should grow ~m² on one task
    # while salted divides the same m² by the chunk fan-out.
    _hot_sigs: dict[int, object] = {}

    def warm_hot_sigs(sf_dir, m):
        if m not in _hot_sigs:
            from fabrix_spark.operators import dedup

            docs = spark.range(500 * m).select(
                F.col("id").alias("doc_id"),
                F.lit(
                    "the quick brown fox jumps over the lazy dog again and again"
                ).alias("text"),
            )
            _hot_sigs[m] = dedup.minhash_signatures(
                docs, 16, 3, "text", "doc_id"
            ).localCheckpoint(eager=True)

    def op_lsh_hot(salt):
        # Broadcast OFF for this op: at bench scale the banded table
        # broadcasts and the probe side's pair generation is already
        # spread across input splits — no straggler, salt irrelevant.
        # At 100 TB the banded table CANNOT broadcast: the join is
        # sort-merge, the hot (band,key) lands on ONE reducer per
        # band, and that is the straggler the salt exists to split.
        # Forcing SMJ here measures the at-scale plan shape.
        # AQE partition coalescing must be off too: it merges by
        # shuffle INPUT bytes, and the banded rows are narrow — it
        # happily folds all 32 salted chunks back into one partition,
        # blind to the join-output explosion. (Production note: on a
        # salted hot-bucket join, tune coalescePartitions.minPartition
        # Size or disable coalescing for the stage — the salt is
        # useless if AQE re-merges the chunks.)
        # Wall-time alone also hides the effect at this scale (the
        # pair-DISTINCT shuffle, identical in both paths, dominates),
        # so the op additionally reports the STRAGGLER — the max task
        # duration across the query's stages, via the UI REST API.
        def op(sf_dir, m):
            from fabrix_spark.operators import dedup

            prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            prev_c = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
            try:
                n, straggler = _with_straggler(
                    spark,
                    lambda: dedup.lsh_candidate_pairs(
                        _hot_sigs[m], 16, 4, "doc_id", salt=salt
                    ).count(),
                )
                tag = f"salt={salt}" if salt else "unsalted"
                print(
                    f"#   lsh_hot {tag} m={m}: straggler_task={straggler:.2f}s",
                    file=sys.stderr,
                )
                return n
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)
                spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_c)

        return op

    def op_knn_graph(sf_dir, m):
        import math as _math

        from fabrix_spark.operators import similarity as _sim

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        planes = 6 + int(_math.log2(m)) if m > 1 else 6
        return _sim.knn_graph(emb, k=3, n_planes=planes, n_tables=4, dim=64).count()

    ops = [
        ("d_minhash_lsh", run_registry("d_minhash_lsh"), None),
        ("d_incremental_probe", op_incremental_probe, warm_incremental),
        ("d_semdedup (k=8m)", op_semdedup, None),
        ("sim_ivfpq_topk (nlist=16m)", op_ivfpq, None),
        ("pipeline_llm_prep", run_registry("pipeline_llm_prep"), None),
        # iterative CC over minhash pairs — the label-propagation shape
        ("d_dup_clusters", run_registry("d_dup_clusters"), None),
        # exact inverted-index + verify — the candidate-bound shape
        ("d_jaccard_pairs", run_registry("d_jaccard_pairs"), None),
        # r9: the hot-shingle-robust exact alternative, measured on the
        # same corpus so the inverted-vs-prefix crossover is data, not
        # argument (prefix indexes only the rarity-sorted prefix of
        # each doc, so it trades a df-aggregate + per-doc window for
        # immunity to hot-shingle candidate blowup)
        ("d_jaccard_prefix", op_jaccard_prefix, None),
        # r8: the two paths previously argued from plan shape only
        ("stream_admission (3 batches)", op_stream_admission, None),
        ("gr_pagerank (|E|=3m·docs)", op_pagerank, None),
        ("gr_label_prop (|E|=3m·docs)", op_label_prop, None),
        ("gr_k_core (|E|=3m·docs)", op_k_core, None),
        ("gr_k_core_stable (|E|=3m·docs)", op_k_core_stable, None),
        ("tj_asof (m× events)", op_asof, None),
        # r8 late additions: bigram LM scoring (two count shuffles +
        # gram join) and MG heavy hitters (map-only candidates +
        # candidate-bounded verify)
        ("t_lm_score", run_registry("t_lm_score"), None),
        ("prof_heavy_hitters", run_registry("prof_heavy_hitters"), None),
        # r10: hot-bucket salt measurement (see warm_hot_sigs comment)
        ("lsh_hot_unsalted (B=500m)", op_lsh_hot(None), warm_hot_sigs),
        ("lsh_hot_salted8 (B=500m)", op_lsh_hot(8), warm_hot_sigs),
        # r10 additions. knn_graph's scale contract (docstring): bucket
        # count must grow with the corpus or candidates go quadratic —
        # n_planes += log2(m) doubles buckets per corpus doubling, the
        # same contract as IVF nlist ∝ m.
        ("sim_knn_graph (planes=6+log2m)", op_knn_graph, None),
        # r17: the reworked rp_topk (narrow (q_id, c_id, score) candidate
        # shuffle instead of full-width vectors) — fixed 8-query probe
        # set over an m× corpus, so the curve measures the corpus-side
        # projection pass + the narrowed candidate ranking
        ("sim_rp_topk", run_registry("sim_rp_topk"), None),
        ("t_bm25_search", run_registry("t_bm25_search"), None),
        ("t_phrase_search", run_registry("t_phrase_search"), None),
        ("w_global_rank", run_registry("w_global_rank"), None),
        ("smp_negative_pairs", run_registry("smp_negative_pairs"), None),
        ("tj_ewma (m x events)", run_registry("tj_ewma"), None),
    ]

    # r11-staged queries (fabrix_spark.queries.STAGED — full oracles,
    # not yet driver-visible): measured here so their promotion lands
    # with scaling evidence already on file. Notes on the synthesized
    # corpora: the `_c` token suffixes fail the BPE [a-z]{2,} word
    # filter, so bpe encode/train see copy-0's vocab at every m — the
    # curve measures the corpus-sized pass (posexplode / word-freq
    # agg), which is exactly the component that scales; the embedding
    # sign-isometry flips scores per copy, so distinct scores ∝ m and
    # the ml curves measure the range-partitioned cumulative pass.
    def run_staged(name):
        # resolves STAGED first, then REGISTRY — staged queries keep
        # their curve entries after promotion (t_bpe_encode and
        # m_audio_fingerprint moved to the registry in r12)
        from fabrix_spark.queries import STAGED

        def op(sf_dir, m):
            qd = STAGED.get(name) or REGISTRY[name]
            return qd.fn(spark, sf_dir).count()

        return op

    def op_knn_label_fixed_probes(sf_dir, m):
        # the operator's scale contract: the PROBE set is bounded (the
        # same bounded-query contract as every sim_* headliner), the
        # corpus grows — so pin probes to copy 0 (ids < STRIDE) and
        # measure the probe×corpus scan at growing corpus
        from fabrix_spark.operators import similarity as _sim

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        probes = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < STRIDE))
        return _sim.cosine_topk(emb, probes, k=5).count()

    ops += [
        ("tj_resample_interp (m× events)", run_staged("tj_resample_interp"), None),
        ("ml_roc_points (m× scores)", run_staged("ml_roc_points"), None),
        ("ml_average_precision", run_staged("ml_average_precision"), None),
        ("t_bpe_encode", run_staged("t_bpe_encode"), None),
        ("m_audio_fingerprint", run_staged("m_audio_fingerprint"), None),
        ("t_url_canonical", run_staged("t_url_canonical"), None),
        ("ml_auc_by_segment", run_staged("ml_auc_by_segment"), None),
        ("fe_standardize_by_lang", run_staged("fe_standardize_by_lang"), None),
        ("fe_quantile_bins_by_lang", run_staged("fe_quantile_bins_by_lang"), None),
        # r12-staged: DSIR (two tokenize passes + dim-sized ratio
        # broadcast), one-pass integer Gram + driver power iteration,
        # and the fixed-probe k-NN label screen
        ("t_dsir_weights", run_staged("t_dsir_weights"), None),
        ("ml_pca_top_component", run_staged("ml_pca_top_component"), None),
        ("knn_label_scan (fixed probes)", op_knn_label_fixed_probes, None),
        ("ml_pca_centered", run_staged("ml_pca_centered"), None),
        ("pipeline_dsir_curation", run_staged("pipeline_dsir_curation"), None),
        ("smp_target_mix", run_staged("smp_target_mix"), None),
        ("sim_ivfpq_recall", run_staged("sim_ivfpq_recall"), None),
        ("sim_hybrid_rrf", run_staged("sim_hybrid_rrf"), None),
        ("ml_embedding_drift", run_staged("ml_embedding_drift"), None),
        # r13-staged: KS over m× events (distinct values grow with the
        # union), 3-pass integer GD over m× documents, and the
        # Gram+project+cap coreset over m× embeddings
        ("ml_ks_test (m× events)", run_staged("ml_ks_test"), None),
        ("ml_logreg_gd (m× documents)", run_staged("ml_logreg_gd"), None),
        ("pipeline_coreset_select", run_staged("pipeline_coreset_select"), None),
        ("ml_gini_split (m× documents)", run_staged("ml_gini_split"), None),
        ("ml_nb_lang_predict", run_staged("ml_nb_lang_predict"), None),
        ("prof_chi2_assoc (m× documents)", run_staged("prof_chi2_assoc"), None),
        ("pipeline_quality_filter", run_staged("pipeline_quality_filter"), None),
        ("smp_weighted_topk", run_staged("smp_weighted_topk"), None),
        ("e_top_paths (m× events)", run_staged("e_top_paths"), None),
        ("prof_mi_assoc (m× documents)", run_staged("prof_mi_assoc"), None),
        ("d_dup_profile (m× documents)", run_staged("d_dup_profile"), None),
        # gr_k_core: measured above on the |E| ∝ m synthetic edge
        # table (derived from the documents multiplier) — the staged
        # QUERY runs on the fixed-size purchase graph, but the
        # OPERATOR's curve is what the 100 TB claim rests on
        ("ml_nb_holdout", run_staged("ml_nb_holdout"), None),
        # r14: per-copy token suffixing keeps duplicate density (and
        # so blocking-candidate density) constant per copy — the
        # property the blocking+verify cost scales on
        ("d_fuzzy_pairs (m× documents)", run_staged("d_fuzzy_pairs"), None),
        ("fuzzy_join (delta vs corpus)", op_fuzzy_join, None),
        # r17: the out-of-order sessionizer replay over m× events —
        # per-copy user spaces are disjoint (user_id shifted by the
        # stride), so per-key event density stays constant and the
        # curve measures the per-batch interval-merge fold + state
        # store at m× keys; the batch COUNT is fixed (windows derive
        # from the unchanged 30-day ts span), the per-batch volume
        # grows m×
        ("stream_session_ooo (m× events)", run_staged("stream_session_ooo_replay"), None),
    ]
    if args.ops:
        wanted = {w.strip() for w in args.ops.split(",")}
        ops = [o for o in ops if any(o[0].startswith(w) for w in wanted)]

    results = {}
    for name, op, warm in ops:
        times, rows = [], []
        for m in factors:
            d = dirs[m]
            if warm:
                warm(d, m)
            best, n = None, None
            for _ in range(args.runs):
                t0 = time.time()
                n = op(d, m)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
            rows.append(n)
        e = fit_exponent(factors, times)
        e_tail = fit_exponent(factors[-2:], times[-2:]) if len(factors) >= 2 else e
        results[name] = {
            "times": [round(t, 2) for t in times],
            "rows": rows,
            "exponent": round(e, 2),
            "exponent_tail": round(e_tail, 2),
        }
        print(f"# {name}: times={results[name]['times']} rows={rows} "
              f"e={results[name]['exponent']} e_tail={results[name]['exponent_tail']}",
              file=sys.stderr)

    print("| operator | " + " | ".join(f"{m}× (s)" for m in factors)
          + " | rows@max | fit e | tail e |")
    print("|---|" + "---|" * (len(factors) + 3))
    for name, r in results.items():
        print(f"| {name} | " + " | ".join(f"{t:.2f}" for t in r["times"])
              + f" | {r['rows'][-1]} | {r['exponent']:.2f} | {r['exponent_tail']:.2f} |")
    print(json.dumps({"factors": factors, "results": results}))


if __name__ == "__main__":
    main()
