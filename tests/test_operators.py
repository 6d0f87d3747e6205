"""North-star operators: dedup / similarity / text / multimodal."""

import pytest
from pyspark.sql import functions as F

from fabrix_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# -- text -------------------------------------------------------------------


def test_token_count(docs):
    out = text.token_count(docs).collect()
    assert len(out) == docs.count()
    assert all(r["n_tokens"] >= 1 for r in out)
    assert all(r["n_unique_tokens"] <= r["n_tokens"] for r in out)


def test_token_rarity(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.token_rarity(df).collect()}
    # corpus counts: a=3, b=1, c=1
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_token_count"] == round((3 + 3 + 1) / 3, 6)
    assert rows[1]["min_token_count"] == 1 and rows[1]["n_hapax"] == 1
    assert rows[2]["n_tokens"] == 2
    assert rows[2]["mean_token_count"] == 2.0
    assert rows[2]["n_hapax"] == 1


def test_prune_rare_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.prune_rare_tokens(df, min_count=2).collect()}
    assert rows[1]["clean_text"] == "a a" and rows[1]["n_dropped"] == 1
    assert rows[2]["clean_text"] == "a" and rows[2]["n_dropped"] == 1
    # every token rare → empty doc survives as a row
    assert rows[3]["clean_text"] == "" and rows[3]["n_dropped"] == 1
    assert rows[3]["n_tokens"] == 1


def test_quality_score(docs):
    row = text.quality_score(docs).first()
    assert 0.0 <= row["stopword_ratio"] <= 1.0
    assert 0.0 <= row["punct_ratio"] <= 1.0


def test_lang_id(docs):
    out = text.lang_id(docs)
    langs = {r["pred_lang"] for r in out.select("pred_lang").distinct().collect()}
    assert langs <= set(text.LANG_STOPWORDS)


def test_fingerprint_collates(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "a b c c"), (3, "x y")], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_text_quality_empty_and_null_contract(spark):
    """r17 self-review pins: empty/NULL documents must not crash the
    job or produce confident nonsense. Under ANSI mode (Spark 4's
    default) an empty document's punct_ratio divided 0/0 and KILLED
    the whole pass in quality_score and repetition_scores; a NULL
    document was labeled 'fr' by lang_id (NULL comparisons fell
    through every CASE branch to the last otherwise) and collided
    with genuinely-empty docs under fingerprint's dedup key
    (concat_ws renders a NULL array as '')."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "hello world hello")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in text.quality_score(df).collect()}
    assert q[1]["punct_ratio"] is None  # 0-char doc: NULL, not a crash
    assert q[2]["punct_ratio"] is None and q[2]["n_tokens"] is None
    assert q[4]["mean_token_len"] == 5.0

    r = {x["doc_id"]: x for x in text.repetition_scores(df).collect()}
    assert r[1]["dup_bigram_char_frac"] is None  # empty grams: NULL
    assert r[4]["top_word_frac"] == 0.666667

    lang = {x["doc_id"]: x["pred_lang"] for x in text.lang_id(df).collect()}
    assert lang[2] is None  # NULL text predicts NULL, never 'fr'
    assert lang[4] == "en"

    fp = {x["doc_id"]: x["fingerprint"] for x in text.fingerprint(df).collect()}
    assert fp[2] is None  # NULL text must not share empty text's key
    assert fp[1] == fp[3] is not None  # genuinely-empty docs still collide


# -- dedup ------------------------------------------------------------------


def test_graph_null_edges_and_metrics_nan_scores(spark):
    """r17 self-review pins: (a) NULL-endpoint edges are excluded at
    to_undirected, the graph family's shared entry — every NULL-src
    edge shares the SAME phantom NULL node, so min-label propagation
    silently BRIDGED otherwise-disjoint clusters through it and k-core
    could retain a phantom node whose degree was the corpus's
    missing-id count; (b) NaN scores are excluded across the metrics
    family (auc/roc/pr/ap/threshold/ks), matching calibration_bins'
    existing NaN exclusion — NaN is greatest in Spark's total order,
    so a NaN-scored row silently became the TOP-ranked threshold."""
    from fabrix_spark.operators import graph as gr
    from fabrix_spark.operators import metrics as mt

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (None, 4), (4, None), (None, 9)],
        "src long, dst long",
    )
    labels = {r["node"]: r["label"] for r in gr.min_label_propagation(edges, iters=3).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}  # no phantom NULL node or bridge
    cores = {r["node"] for r in gr.k_core(edges, k=2, iters=3).collect()}
    assert cores == {1, 2, 3}

    ev = spark.createDataFrame(
        [(1, 1.0, 0.9), (2, 0.0, 0.4), (3, 1.0, float("nan")), (4, 0.0, None), (5, 1.0, 0.7)],
        "event_id long, label double, score double",
    )
    pos = F.col("label") == 1.0
    roc = mt.roc_points(ev, "score", pos).collect()
    assert all(not math.isnan(r["score"]) for r in roc)
    assert max(r["tp"] + r["fp"] for r in roc) == 3  # NaN + NULL rows gone
    ap = mt.average_precision(ev, "score", pos).collect()[0]
    assert ap["n"] == 3 and ap["n_pos"] == 2


def test_dedup_null_text_and_poisoned_vector_contracts(spark):
    """r17 self-review pins for the dedup family's missing-content
    edges: (a) NULL-text rows are excluded at the shared shingle entry
    — shingles(NULL) collapsed to the single shingle '' (the same
    degenerate set an EMPTY doc produces), so every missing-content
    row paired with every empty row at Jaccard 1.0, and exact_dup_
    groups reported all NULL-text docs as one duplicate group (md5 of
    NULL groups together); empty docs still dedupe against each other
    (identical content IS a duplicate); (b) the embedding entries
    exclude NULL vectors, NaN-component vectors (ANSI long-cast death
    inside the quantizer) and zero-NORM vectors (the 0/0 cosine is an
    ANSI DIVIDE_BY_ZERO task killer), and decontaminate_semantic keeps
    its unfiltered id spine so unscoreable rows report -1/false."""
    t = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(
        [(1, t), (2, t + " tail"), (3, None), (4, ""), (5, "   ")],
        "doc_id long, text string",
    )
    groups = {r["representative"]: r["n_dups"] for r in dedup.exact_dup_groups(docs).collect()}
    assert 3 not in groups and groups[4] == 1 and groups[5] == 1
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs == {(1, 2), (4, 5)}  # NULL doc gone; empty-vs-ws kept
    mh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert mh == {(1, 2), (4, 5)}

    emb = spark.createDataFrame(
        [
            (1, [1.0] * 8),
            (2, [1.0] * 7 + [0.9]),
            (3, None),
            (4, [float("nan")] * 8),
            (5, [0.0] * 8),
            (6, [1.0] * 7 + [None]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = dedup.embedding_dedup_pairs(emb, threshold=0.9, id_col="vec_id", method="exact").collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    dec = {r["vec_id"]: (r["max_benchmark_cosine"], r["contaminated"])
           for r in dedup.decontaminate_semantic(emb, emb.filter("vec_id = 1"), threshold=0.9, id_col="vec_id").collect()}
    assert dec[2] == (0.99944, True)
    assert dec[3] == (-1.0, False) and dec[4] == (-1.0, False) and dec[5] == (-1.0, False)

    from fabrix_spark.operators.similarity import cosine_range_search, cosine_topk

    topk = cosine_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    assert [(r["q_id"], r["c_id"]) for r in topk] == [(1, 2)]
    rng = cosine_range_search(emb, emb.filter("vec_id = 1"), threshold=0.5).collect()
    assert [(r["q_id"], r["c_id"]) for r in rng] == [(1, 2)]


def test_exact_dedup(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string")
    assert dedup.exact_dedup(df, ["text"]).count() == 2
    groups = {r["representative"]: r["n_dups"] for r in dedup.exact_dup_groups(df).collect()}
    assert groups == {1: 2, 3: 1}


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    row = df.select(dedup.shingles(F.col("text"), 3).alias("s")).first()
    assert row["s"] == ["a b c", "b c d"]
    short = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert short.select(dedup.shingles(F.col("text"), 3).alias("s")).first()["s"] == ["a b"]


def test_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(df, threshold=0.3).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_shingle_kernel_matches_expression_pipeline(spark):
    """The r18 Arrow shingle/signature kernel must be BIT-identical to
    the expression pipeline it replaced (_shingle_sets_expr +
    transform/array_min minhash): same distinct-shingle arrays in the
    same first-occurrence order, same md5-derived h32 mins — over a
    synthetic corpus AND adversarial whitespace. Java-regex semantics
    pinned explicitly: \\s is ASCII-only (U+00A0 NBSP and U+2028 LS are
    TOKEN CHARACTERS, not separators), F.trim strips 0x20 only, and
    split keeps leading/trailing empty tokens (text starting with a
    tab tokenizes to ['', ...])."""
    rows = [
        (1, "a b c d e"),
        (2, ""),
        (3, "   "),
        (4, "\t"),
        (5, "\tleading tab token case"),
        (6, "a  b\tc\nd e"),
        (7, "x y"),
        (8, "one two three"),
        (9, " lead and trail words here "),
        (10, "tab\tend\t"),
        (11, "nb\u00a0sp inside token here more"),
        (12, "uni\u2028sep stays in token fine"),
        (13, "a\x0bb c d e f"),
        (14, "\r\nwindows line two three four"),
        (15, None),
        (16, "solo"),
        (17, "emoji \U0001f600 test case four five"),
        (18, "dup dup dup dup dup dup dup"),
    ] + [
        (100 + i, f"the quick brown fox number {i % 7} jumps over the lazy dog {i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp_sets = {r["__id"]: r["__set"] for r in dedup._shingle_sets_expr(df, "text", "doc_id", 3).collect()}
    got_sets = {r["__id"]: r["__set"] for r in dedup._shingle_sets(df, "text", "doc_id", 3).collect()}
    assert got_sets == exp_sets

    # signatures: kernel vs the expression path over materialized sets
    sets = dedup._shingle_sets_expr(df, "text", "doc_id", 3).localCheckpoint()
    exp_sigs = {
        r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16))
        for r in dedup.minhash_signatures(df, 16, 3, "text", "doc_id", sets=sets).collect()
    }
    got_sigs = {
        r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16))
        for r in dedup.minhash_signatures(df, 16, 3, "text", "doc_id").collect()
    }
    assert got_sigs == exp_sigs

    # plan pin: the fused scan is ONE Arrow stage — MapInArrow present,
    # no array_distinct / higher-order shingle expressions anywhere
    frame = dedup._shingle_frame(df, "text", "doc_id", 3, n_hashes=16)
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "array_distinct" not in plan and "transform(" not in plan


def test_checkpoint_wins_source_scanned_once(spark):
    """r18 pin for the r17/r18 checkpoint + single-pass-symmetrize
    wins (judge item #5): the caller's expensive upstream subtree must
    execute exactly ONCE per operator call. The source is an
    accumulator-counting RDD, so every re-execution of the logical
    source is counted directly — a regression that drops a checkpoint
    or reintroduces a union-of-projections re-scan fails loudly."""
    from fabrix_spark.operators import graph

    sc = spark.sparkContext
    n = 40
    data = [(i, (i * 7 + 1) % n) for i in range(n)] + [(i, (i + 1) % n) for i in range(n)]

    def counted_edges(cols="src long, dst long"):
        acc = sc.accumulator(0)

        def bump(row):
            acc.add(1)
            return row

        return spark.createDataFrame(sc.parallelize(data, 2).map(bump), cols), acc

    # pagerank(checkpoint=True): prepared edge set checkpointed FIRST
    edges, acc = counted_edges()
    graph.pagerank(edges, iters=2, checkpoint=True).count()
    assert acc.value == len(data), f"pagerank scanned source {acc.value / len(data):.1f}x"

    # triangle_counts: canonical edge list checkpointed once
    edges, acc = counted_edges()
    graph.triangle_counts(edges).count()
    assert acc.value == len(data), f"triangle_counts scanned source {acc.value / len(data):.1f}x"

    # to_undirected: single explode pass (was fwd ∪ reversed — 2 scans)
    edges, acc = counted_edges()
    graph.to_undirected(edges).count()
    assert acc.value == len(data), f"to_undirected scanned source {acc.value / len(data):.1f}x"

    # bfs_distances: edge list checkpointed once up front
    edges, acc = counted_edges()
    seeds = spark.createDataFrame([(0,)], "node long")
    graph.bfs_distances(edges, seeds, max_hops=3).count()
    assert acc.value == len(data), f"bfs scanned source {acc.value / len(data):.1f}x"

    # dup_clusters (label strategy → _cc_min_label): the candidate-pair
    # pipeline is symmetrized in one explode pass and checkpointed once
    pair_rows = [(i, i + 1) for i in range(0, n - 1, 2)]
    accp = sc.accumulator(0)

    def bump_p(row):
        accp.add(1)
        return row

    pairs = spark.createDataFrame(
        sc.parallelize(pair_rows, 2).map(bump_p), "id_a long, id_b long"
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    dedup.dup_clusters(nodes, pairs).count()
    assert accp.value == len(pair_rows), f"dup_clusters scanned pairs {accp.value / len(pair_rows):.1f}x"


def test_cosine_guard_fused_no_exists_pass(spark):
    """r18: the NaN/NULL vector guard is fused into the quantize
    transform (poisoned component → NULL element → NULL norm → dropped
    by n2 > 0), so the plan must carry NO separate exists() traversal —
    while still excluding exactly the rows _finite_vectors excluded
    (behavior pinned by test_dedup_null_text_and_poisoned_vector_contracts)."""
    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [0.9] * 8), (3, None), (4, [float("nan")] * 8)],
        "vec_id long, embedding array<double>",
    )
    for q in (
        similarity.cosine_topk(emb, emb.filter("vec_id = 1"), k=3),
        similarity.cosine_range_search(emb, emb.filter("vec_id = 1"), threshold=0.5),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "exists(" not in plan
    got = similarity.cosine_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    assert [(r["q_id"], r["c_id"]) for r in got] == [(1, 2)]


def _uf_components(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@pytest.mark.parametrize("seed,n,m", [(1, 40, 25), (2, 60, 80), (3, 50, 10)])
def test_dup_clusters_star_matches_label_random_graphs(spark, seed, n, m):
    """Property: large-star/small-star contraction and min-label
    propagation produce the identical (node → component-min) map —
    both checked against a driver-side union-find ground truth."""
    import random

    rng = random.Random(seed)
    pairs = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)})
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    want = _uf_components(n, pairs)
    for strategy in ("label", "star"):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(nodes, pdf, strategy=strategy).collect()
        }
        assert got == want, strategy


def test_dup_clusters_star_long_chain(spark):
    """A 64-node chain has diameter 63 — min-label would need 63
    rounds, star contraction collapses it within its default budget."""
    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pdf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(nodes, pdf, max_iterations=10, strategy="star").collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_jaccard_prefix_matches_inverted(docs):
    """Both exact candidate strategies must produce the identical pair
    set — prefix filtering's recall guarantee is provably complete."""
    inv = sorted(map(tuple, dedup.jaccard_pairs(docs, threshold=0.2).collect()))
    pre = sorted(map(tuple, dedup.jaccard_pairs(docs, threshold=0.2, method="prefix").collect()))
    assert inv == pre and len(inv) > 0


def test_minhash_lsh_finds_near_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
            (3, "spark shuffles partitions across the cluster during wide transformations"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_dedup_pairs(df, threshold=0.4).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_incremental_dedup_matches_full_recompute(spark, docs, tmp_path):
    """Probing the persisted signature store yields exactly the
    cross-side subset of a from-scratch full-corpus LSH dedup — same
    pairs, same jaccard values."""
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    store = dedup.SignatureStore(spark, str(tmp_path / "sigs"))
    store.build(corpus)
    inc = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in dedup.incremental_dedup_pairs(delta, store, corpus, threshold=0.2).collect()
    }
    cross = {}
    for r in dedup.minhash_dedup_pairs(docs, threshold=0.2).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 5 == 0 and b % 5 != 0:
            cross[(a, b)] = r["jaccard"]
        elif b % 5 == 0 and a % 5 != 0:
            cross[(b, a)] = r["jaccard"]
    assert inc == cross and len(inc) > 0


def test_incremental_candidates_read_store_not_corpus(spark, docs, tmp_path):
    """The candidate stage must consume the PERSISTED corpus
    signatures: with the new docs arriving as an in-memory frame, the
    plan scans the store's parquet and NOTHING else on disk — any
    documents.parquet scan would mean the corpus was re-signed."""
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    store = dedup.SignatureStore(spark, str(tmp_path / "sigs"))
    store.build(corpus)
    seed = corpus.first()  # resend a corpus text under a fresh id
    delta = spark.createDataFrame(
        [(10**9, seed["text"])], "doc_id long, text string"
    )
    cands = dedup.incremental_candidates(store.sign(delta), store.read())
    files = cands.inputFiles()  # every file any scan in the plan reads
    assert files and all(str(tmp_path / "sigs") in f for f in files)
    assert not any("documents.parquet" in f for f in files)
    # identical text ⇒ identical signature ⇒ guaranteed candidate
    assert (10**9, seed["doc_id"]) in {
        (r["new_id"], r["corpus_id"]) for r in cands.collect()
    }


def test_containment_detects_excerpt(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    df = spark.createDataFrame(
        [
            (1, base + " nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
            (2, base),  # verbatim excerpt of doc 1's prefix
            (3, "completely different words entirely unrelated content over here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert rows[(2, 1)] == 1.0  # every shingle of the excerpt is in doc 1
    assert (1, 2) not in rows  # the superset is NOT contained in the excerpt
    assert all(3 not in pair for pair in rows)


def test_signature_store_ingest_is_upsert(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    store = dedup.SignatureStore(spark, str(tmp_path / "sigs"))
    store.build(corpus)
    assert store.read().count() == corpus.count()
    store.ingest(delta)
    assert store.read().count() == docs.count()
    store.ingest(delta)  # re-send: key-merge, not append
    assert store.read().count() == docs.count()
    assert store.read().columns[0] == "doc_id"


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert len(sigs) == 3
    h12 = bin(sigs[1] ^ sigs[2]).count("1")
    h13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert h12 < h13


def test_embedding_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.001, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.embedding_dedup_pairs(df, threshold=0.99).collect()}
    assert pairs == {(1, 2)}


def test_hyperplane_dim_mismatch_raises(spark):
    # a wrong inlined-plane dim must fail loudly, never silently send
    # every vector to bucket 0 (which would degenerate the candidate
    # join to a cross product)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="dim=64"):
        similarity.hyperplane_lsh_buckets(df, dim=64).collect()
    # explicit matching dim and derived dim agree
    explicit = similarity.hyperplane_lsh_buckets(df, dim=3).collect()
    derived = {(r["id_a"], r["id_b"]) for r in dedup.embedding_dedup_pairs(df, threshold=0.5).collect()}
    assert len(explicit) == 1 and derived == set()


# -- similarity -------------------------------------------------------------


def test_cosine_topk(emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = similarity.cosine_topk(emb, queries, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert len(rs) == 5
        ranked = sorted(rs, key=lambda r: r["rank"])
        sims = [r["cosine"] for r in ranked]
        assert sims == sorted(sims, reverse=True)


def test_lsh_topk_overlaps_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 2)
    brute = similarity.cosine_topk(emb, queries, k=10)
    approx = similarity.lsh_cosine_topk(emb, queries, k=10, n_planes=4)
    b = {(r["q_id"], r["c_id"]) for r in brute.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    # approximate: require some recall, not exact equality
    assert len(a & b) >= 2


# -- multimodal -------------------------------------------------------------


def test_binary_metadata(docs):
    df = multimodal.attach_binary(docs, "text")
    out = multimodal.binary_metadata(df)
    row = out.first()
    assert row["n_bytes"] > 0 and len(row["content_md5"]) == 32


def test_image_features_fake_decode(docs):
    df = multimodal.attach_binary(docs.limit(20), "text")
    out = multimodal.decode_image_features(df, fake_decode=True)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] >= 1 and r["n_bytes"] > 0 for r in rows)


def test_image_decode_stub_raises(docs):
    df = multimodal.attach_binary(docs.limit(1), "text")
    with pytest.raises(Exception):
        multimodal.decode_image_features(df, fake_decode=False).collect()


def test_sample_frames(docs):
    df = multimodal.attach_binary(docs.limit(5), "text")
    out = multimodal.sample_frames(df, every_n=2, fake_decode=True)
    assert out.count() > 5


def test_dup_clusters_and_canonical(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # components: {0,1,2,3} (chain), {5,6}, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    clusters = dedup.dup_clusters(nodes, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}

    kept = dedup.keep_canonical(nodes, clusters)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 4, 5, 7]


def test_audio_features_fake_decode(docs):
    df = multimodal.attach_binary(docs.limit(10), "text")
    rows = multimodal.decode_audio_features(df, fake_decode=True).collect()
    assert len(rows) == 10
    assert all(r["duration_s"] > 0 and r["sample_rate"] == 16000 for r in rows)


def test_audio_decode_stub_raises(docs):
    df = multimodal.attach_binary(docs.limit(1), "text")
    with pytest.raises(Exception):
        multimodal.decode_audio_features(df, fake_decode=False).collect()


def test_binary_file_source_end_to_end(spark, tmp_path):
    """Real ``spark.read.format('binaryFile')`` ingest — the
    production multimodal path: one row per object with path/length/
    content, fed through the same metadata + fake-decode kernels."""
    import hashlib

    payloads = {f"blob_{i}.bin": bytes([i]) * (100 + i) for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    df = spark.read.format("binaryFile").load(str(tmp_path))
    assert {f.name for f in df.schema} == {"path", "modificationTime", "length", "content"}

    meta = multimodal.binary_metadata(df, bin_col="content", id_col="path")
    got = {r["path"].rsplit("/", 1)[-1]: (r["n_bytes"], r["content_md5"]) for r in meta.collect()}
    for name, data in payloads.items():
        assert got[name] == (len(data), hashlib.md5(data).hexdigest())

    feats = multimodal.decode_image_features(
        df.withColumn("doc_id", F.monotonically_increasing_id()), fake_decode=True
    )
    assert feats.count() == 4


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),         # one token repeated 4×
            (2, "all words here are unique"),   # no repetition
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.repetition_scores(df).collect()}
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["dup_bigram_char_frac"] == 1.0  # "spam spam" ×3
    assert got[2]["top_word_frac"] == 0.2
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_bigram_char_frac"] == 0.0


def test_decontaminate(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over anything")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dedup.decontaminate(train, bench, shingle_size=5).collect()}
    assert got[1]["contaminated"] and got[1]["n_overlap"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_overlap"] == 0


def test_unigram_entropy(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy, TTR 0.25
            (2, "a b c d"),          # max entropy ln(4), TTR 1.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.unigram_entropy(df).collect()}
    assert got[1]["entropy"] == 0.0
    assert got[1]["type_token_ratio"] == 0.25
    assert got[2]["entropy"] == round(math.log(4), 6)
    assert got[2]["type_token_ratio"] == 1.0
    assert got[2]["n_tokens"] == 4 and got[2]["n_unique_tokens"] == 4


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [
            (1, "to be or not to be"),
            (2, "to be is the question"),
            (3, "x"),  # shorter than n → contributes nothing
        ],
        "doc_id long, text string",
    )
    rows = text.top_ngrams(df, n=2, k=2).collect()
    assert [r["gram"] for r in rows] == ["to be", "be is"]  # 3 occurrences, then tie→asc
    top = rows[0]
    assert top["n_occurrences"] == 3 and top["n_docs"] == 2


def test_remove_common_segments(spark):
    # segment "SUBSCRIBE NOW CLICK HERE" appears in 3 docs → dropped
    boiler = "SUBSCRIBE NOW CLICK HERE"
    df = spark.createDataFrame(
        [
            (1, f"{boiler} real content one two"),
            (2, f"{boiler} other words go here"),
            (3, f"{boiler} third document body text"),
            (4, "clean document with original text"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup.remove_common_segments(df, seg_words=4, max_docs=2).collect()
    }
    assert got[1]["clean_text"] == "real content one two"
    assert got[1]["n_segments"] == 2 and got[1]["n_dropped"] == 1
    assert got[4]["clean_text"] == "clean document with original text"
    assert got[4]["n_dropped"] == 0


def test_pack_sequences(spark):
    from fabrix_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, 600) for i in range(20)], "doc_id long, n_tok long"
    )
    rows = sampling.pack_sequences(df, "doc_id", "n_tok", budget=1000, shards=2).collect()
    assert len(rows) == 20
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1}
    for shard_rows in by_shard.values():
        # offsets are the running sum of lengths within the shard
        offs = sorted(r["pack_offset"] for r in shard_rows)
        assert offs == [i * 600 for i in range(len(shard_rows))]
        for r in shard_rows:
            assert r["pack"] == r["pack_offset"] // 1000


def test_leakage_safe_split_total_coverage_and_cluster_atomicity(spark):
    """The two contracts a contamination-safe split must honor:
    (a) TOTAL — every input document appears exactly once in the
    output, including docs with no dedup edge at all (dup_clusters
    emits singletons, so the inner join drops nothing — this pins
    that contract); (b) CLUSTER-ATOMIC — documents connected by any
    chain of near-dup edges land in the same split."""
    from fabrix_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(40)], "doc_id long, text string"
    )
    # a transitive chain (1-2-3), a plain pair (10-11), the rest edge-less
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = sampling.leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(40))  # total, exactly once
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["cluster_id"] == by_id[2]["cluster_id"] == by_id[3]["cluster_id"] == 1
    assert len({by_id[i]["split"] for i in (1, 2, 3)}) == 1  # chain stays together
    assert by_id[10]["split"] == by_id[11]["split"]
    assert by_id[7]["cluster_id"] == 7  # edge-less doc: own singleton cluster
    assert set(r["split"] for r in out) <= {"train", "val", "test"}
    # deterministic: identical assignment on rerun
    again = sampling.leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    assert {r["doc_id"]: r["split"] for r in again} == {
        r["doc_id"]: r["split"] for r in out
    }


def test_rebalance_groups(spark):
    from fabrix_spark.operators import sampling

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sampling.rebalance_groups(df, "doc_id", "grp")
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 40                      # floor group keeps everything
    assert abs(counts["big"] - 40) <= 15              # ~10% hash sample of 400
    # determinism: same result again
    again = sampling.rebalance_groups(df, "doc_id", "grp")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_cosine_topk_blocked_matches_expression_path(emb):
    corpus, queries = emb, emb.filter(F.col("vec_id") < 4)
    a = similarity.cosine_topk(corpus, queries, k=3)
    b = similarity.cosine_topk_blocked(corpus, queries, k=3)
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    ra = sorted(a.collect(), key=key)
    rb = sorted(b.collect(), key=key)
    assert [(r["q_id"], r["c_id"], r["cosine"], r["rank"]) for r in ra] == [
        (r["q_id"], r["c_id"], r["cosine"], r["rank"]) for r in rb
    ]


def test_cosine_topk_blocked_empty_queries(emb):
    out = similarity.cosine_topk_blocked(emb, emb.filter(F.col("vec_id") < 0), k=3)
    assert out.count() == 0


def test_cosine_topk_blocked_tie_group_larger_than_k(spark):
    """Many exact-duplicate embeddings in ONE batch: the global
    tie-break is (cosine desc, c_id asc), so the top-k must be the
    LOWEST c_ids of the tie group — a fixed batch-local slack would
    clip them. The blocked path must match the expression path."""
    dups = [(i, [1.0, 2.0, 3.0]) for i in range(30)]  # 30 > k + 8 slack
    rows = dups + [(100, [-3.0, 1.0, 0.5]), (101, [0.1, 0.2, 0.9])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(1)
    queries = df.filter(F.col("vec_id") == 100)
    exact = similarity.cosine_topk(df, queries, k=5).collect()
    blocked = similarity.cosine_topk_blocked(df, queries, k=5).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    tup = lambda rs: [(r["q_id"], r["c_id"], r["cosine"], r["rank"]) for r in sorted(rs, key=key)]  # noqa: E731
    assert tup(blocked) == tup(exact)
    # the tie group contributes its LOWEST c_ids (0..n), not arbitrary members
    tie_ids = [r["c_id"] for r in sorted(blocked, key=key) if r["c_id"] < 100]
    assert tie_ids == sorted(tie_ids) and tie_ids == list(range(len(tie_ids)))


def test_weighted_sample(spark):
    from fabrix_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)] + [(1000 + i, 0.0) for i in range(100)],
        "doc_id long, w double",
    )
    out = sampling.weighted_sample(df, "doc_id", F.col("w")).collect()
    kept = {r["doc_id"] for r in out}
    assert all(i < 1000 for i in kept)      # zero-weight rows never kept
    assert len(kept) == 100                 # weight-1 rows always kept


def _tiny_bmp() -> bytes:
    import struct

    # 2×2 24bpp: bottom row (blue, green), top row (red, white); stride 8
    row_bottom = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # BGR: blue, green
    row_top = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red, white
    pixels = row_bottom + row_top
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _tiny_wav(rate=8000, n=1600) -> bytes:
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(10000 * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_bmp_real_decode(spark):
    import numpy as np

    from fabrix_spark.operators.multimodal import decode_bmp, decode_image_features

    blob = _tiny_bmp()
    w, h, mean = decode_bmp(blob)
    assert (w, h) == (2, 2)
    expected = np.mean([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    assert abs(mean - expected) < 1e-9
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, content binary")
    row = decode_image_features(df).collect()[0]
    assert (row["width"], row["height"]) == (2, 2)
    assert abs(row["mean_px"] - round(expected, 6)) < 1e-9


def test_wav_real_decode(spark):
    from fabrix_spark.operators.multimodal import decode_audio_features, decode_wav

    blob = _tiny_wav(rate=8000, n=1600)
    dur, rate, rms = decode_wav(blob)
    assert rate == 8000 and abs(dur - 0.2) < 1e-9
    assert 6000 < rms < 8000  # sine at amplitude 10000 → RMS ≈ 7071
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, content binary")
    row = decode_audio_features(df).collect()[0]
    assert row["sample_rate"] == 8000 and abs(row["duration_s"] - 0.2) < 1e-9
    assert abs(row["rms"] - round(rms, 6)) < 1e-6


# ---------------------------------------------------------------------------
# property-based differential tests: Spark operator vs pure-Python model
# ---------------------------------------------------------------------------

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["a", "b", "c", "dd", "eee"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@given(_corpus, st.integers(1, 3), st.integers(1, 2))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_remove_common_segments_matches_model(spark, texts, seg_words, max_docs):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_dropped"])
        for r in __import__("fabrix_spark.operators.dedup", fromlist=["dedup"])
        .remove_common_segments(df, seg_words=seg_words, max_docs=max_docs)
        .collect()
    }
    # python model
    segs_per_doc = {}
    for i, t in enumerate(texts):
        w = t.split()
        segs_per_doc[i] = [
            " ".join(w[j : j + seg_words]) for j in range(0, len(w), seg_words)
        ]
    df_count = Counter()
    for i, segs in segs_per_doc.items():
        for s in set(segs):
            df_count[s] += 1
    common = {s for s, c in df_count.items() if c > max_docs}
    for i, segs in segs_per_doc.items():
        kept = [s for s in segs if s not in common]
        assert got[i] == (" ".join(kept), len(segs), len(segs) - len(kept))


@given(_corpus)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_unigram_entropy_matches_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.unigram_entropy(df).collect()}
    for i, t in enumerate(texts):
        counts = Counter(t.lower().split())
        n = sum(counts.values())
        h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        assert got[i]["n_tokens"] == n
        assert got[i]["n_unique_tokens"] == len(counts)
        assert abs(got[i]["entropy"] - h) < 1e-5
        assert abs(got[i]["type_token_ratio"] - len(counts) / n) < 1e-5


@given(st.lists(st.integers(1, 500), min_size=1, max_size=30), st.integers(100, 1000), st.integers(1, 4))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_sequences_matches_model(spark, lengths, budget, shards):
    from fabrix_spark.operators import sampling

    rows = [(i, ln) for i, ln in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (r["shard"], r["pack"], r["pack_offset"])
        for r in sampling.pack_sequences(df, "doc_id", "n", budget=budget, shards=shards).collect()
    }
    # python model re-deriving the same md5 buckets
    import hashlib

    def bucket(v, salt=""):
        return int(hashlib.md5(f"{v}{salt}".encode()).hexdigest()[:8], 16) % 10000

    by_shard = {}
    for i, ln in rows:
        by_shard.setdefault(bucket(i) % shards, []).append((bucket(i, "order"), i, ln))
    for shard, docs in by_shard.items():
        cum = 0
        for _, i, ln in sorted(docs):
            assert got[i] == (shard, cum // budget, cum)
            cum += ln


def test_pq_topk_contract_and_determinism(emb):
    """PQ/ADC: codebooks per subspace, full k results per query, self
    excluded, scores are valid cosines, bit-identical rerun. The exact
    value/ranking parity is pinned by the sim_pq_topk DuckDB oracle."""
    queries = emb.filter(F.col("vec_id") < 4)
    out = similarity.pq_cosine_topk(emb, queries, dim=64, m=4, n_codes=8, k=5).collect()
    by_q = {}
    for r in out:
        assert r["q_id"] != r["c_id"]
        assert -1.0 <= r["cosine_pq"] <= 1.0
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3}
    assert all(sorted(rs) == [1, 2, 3, 4, 5] for rs in by_q.values())
    again = similarity.pq_cosine_topk(emb, queries, dim=64, m=4, n_codes=8, k=5).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted(((r["q_id"], r["rank"], r["c_id"], r["cosine_pq"]) for r in out)) == sorted(
        (r["q_id"], r["rank"], r["c_id"], r["cosine_pq"]) for r in again
    )
    # codebooks: m × n_codes entries, each subvector length dim/m
    cb = similarity.pq_train(emb, dim=64, m=4, n_codes=8).collect()
    assert len(cb) == 32 and all(len(r["__c"]) == 16 for r in cb)


def test_pq_matches_numpy_model_on_random_inputs(spark):
    """Differential model check of the WHOLE PQ pipeline on random
    vectors: an independent numpy re-implementation of quantization,
    seed selection, integer-L2 assignment, exact int64 means,
    re-assignment, and ADC scoring must produce the same rounded
    scores and the same (score desc, id asc) ranking as the Spark
    plan. (The DuckDB oracle proves this cross-engine on the fixture
    corpus; this proves it across random inputs.)"""
    import decimal

    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    dim, m, n_codes, k = 8, 2, 3, 3
    sub = dim // m

    def quant(x):
        s = np.asarray(x, dtype=np.float64) * 1_000_000
        return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)

    def round6(x):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def model(vecs):
        n = len(vecs)
        qv = quant(vecs)  # (n, dim)
        out_codes = np.zeros((n, m), dtype=np.int64)
        cbs = []
        for s in range(m):
            sv = qv[:, s * sub : (s + 1) * sub]
            n2 = (sv * sv).sum(axis=1)
            seed_ids = list(range(min(n_codes, n)))
            cents = {i: sv[i].copy() for i in seed_ids}

            def assign(cents_):
                codes = []
                for i in range(n):
                    best = None
                    for code in sorted(cents_):
                        c = cents_[code]
                        d2 = int(n2[i]) - 2 * int(sv[i] @ c) + int(c @ c)
                        if best is None or d2 < best[0]:
                            best = (d2, code)
                    codes.append(best[1])
                return np.asarray(codes)

            a = assign(cents)
            trained = {}
            for code in sorted(set(a.tolist())):
                members = sv[a == code].astype(np.float64)
                mean = members.sum(axis=0) / len(members)
                trained[code] = np.where(
                    mean >= 0, np.floor(mean + 0.5), np.ceil(mean - 0.5)
                ).astype(np.int64)
            cbs.append(trained)
            out_codes[:, s] = assign(trained)
        scores = {}
        qn2 = (qv * qv).sum(axis=1)
        for qi in range(2):
            for ci in range(n):
                if ci == qi:
                    continue
                adot = rn2 = 0
                for s in range(m):
                    c = cbs[s][out_codes[ci, s]]
                    adot += int(qv[qi, s * sub : (s + 1) * sub] @ c)
                    rn2 += int(c @ c)
                scores[(qi, ci)] = round6(adot / np.sqrt(float(rn2) * float(qn2[qi])))
        expect = {}
        for qi in range(2):
            ranked = sorted(
                ((s, c) for (q, c), s in scores.items() if q == qi),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            for r, (s, c) in enumerate(ranked, 1):
                expect[(qi, c)] = (r, s)
        return expect

    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.floats(min_value=0.0625, max_value=1.0, width=32),
                min_size=dim, max_size=dim,
            ),
            min_size=4, max_size=8,
        )
    )
    def run(vecs):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        queries = df.filter(F.col("vec_id") < 2)
        got = {
            (r["q_id"], r["c_id"]): (r["rank"], r["cosine_pq"])
            for r in similarity.pq_cosine_topk(
                df, queries, dim=dim, m=m, n_codes=n_codes, k=k
            ).collect()
        }
        expect = model(vecs)
        assert set(got) == set(expect)
        for pair, (rank, score) in expect.items():
            g_rank, g_score = got[pair]
            assert g_rank == rank
            assert abs(g_score - score) < 2e-6

    run()


def test_pq_store_matches_inline_and_freezes_codebooks(spark, emb, tmp_path):
    """Store-backed PQ must equal the train-inline path (same seeds,
    same arithmetic); ingest encodes against FROZEN codebooks (the
    codebook table is byte-stable across ingests) and new ids become
    searchable."""
    store = similarity.PQStore(spark, str(tmp_path / "pq"), dim=64, m=4, n_codes=8)
    store.build(emb)
    queries = emb.filter(F.col("vec_id") < 4)
    inline = similarity.pq_cosine_topk(emb, queries, dim=64, m=4, n_codes=8, k=5)
    stored = store.topk(queries, k=5)
    key = lambda r: (r["q_id"], r["rank"], r["c_id"], r["cosine_pq"])  # noqa: E731
    assert sorted(map(key, stored.collect())) == sorted(map(key, inline.collect()))

    n = emb.count()
    cb_before = sorted(
        (r["subspace"], r["code"], tuple(r["__c"])) for r in store.codebooks().collect()
    )
    twins = emb.withColumn("vec_id", F.col("vec_id") + 100000)  # same vectors, new ids
    store.ingest(twins)
    cb_after = sorted(
        (r["subspace"], r["code"], tuple(r["__c"])) for r in store.codebooks().collect()
    )
    assert cb_before == cb_after  # codebooks frozen
    assert store.codes().count() == 2 * n * 4  # m rows per vector, both generations
    # a query's identical twin reconstructs identically → it ties the
    # query's own reconstruction score and ranks at the top
    top = store.topk(queries.limit(1), k=1).collect()[0]
    assert top["c_id"] == top["q_id"] + 100000


def test_pq_store_compaction_preserves_answers(spark, emb, tmp_path):
    """Small-file maintenance composes with the index: after several
    fragmenting ingests, compacting the code table must leave the ANN
    answers bit-identical (and keep the bucket layout)."""
    from fabrix_spark.sources.lake import compact

    store = similarity.PQStore(
        spark, str(tmp_path / "pq"), dim=64, m=4, n_codes=8, buckets=4
    )
    store.build(emb.filter(F.col("vec_id") < 400))
    for lo in (400, 430, 460):  # fragmenting micro-ingests
        store.ingest(emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)))
    queries = emb.filter(F.col("vec_id") < 4)
    key = lambda r: (r["q_id"], r["rank"], r["c_id"], r["cosine_pq"])  # noqa: E731
    before = sorted(map(key, store.topk(queries, k=5).collect()))
    files_before, files_after = compact(spark, store.codes_table.path, target_file_mb=128)
    assert files_after < files_before
    after = sorted(map(key, store.topk(queries, k=5).collect()))
    assert after == before


def test_kmeans_train_deterministic(emb):
    cents1 = similarity.kmeans_train(emb, k=4, iters=1).collect()
    cents2 = similarity.kmeans_train(emb, k=4, iters=1).collect()
    assert sorted(r["vec_id"] for r in cents1) == sorted(r["vec_id"] for r in cents2)
    c1 = {r["vec_id"]: r["embedding"] for r in cents1}
    c2 = {r["vec_id"]: r["embedding"] for r in cents2}
    assert c1 == c2  # bit-identical across runs
    # trained centroids moved off the raw seed vectors
    seeds = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(4).collect()}
    assert any(c1[i] != seeds[i] for i in c1)


def test_semantic_prune_partitions_corpus(emb):
    """SemDeDup invariants: kept ∪ pruned == corpus (no doc lost or
    duplicated); every pruned id has a LOWER-id qualifying pair in its
    cluster; no kept id does; pairs stay within one cluster."""
    t = 0.375
    cents = similarity.kmeans_train(emb, k=8, iters=1)
    pairs = dedup.semantic_dup_pairs(emb, threshold=t, centroids=cents).collect()
    kept = dedup.semantic_prune(emb, threshold=t, centroids=cents).collect()
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    all_ids = set(assign)
    kept_ids = {r["vec_id"] for r in kept}
    assert len(kept) == len(kept_ids)  # no duplicates
    dominated = {r["b_id"] for r in pairs}
    assert kept_ids == all_ids - dominated  # total, exact partition
    for r in kept:
        assert assign[r["vec_id"]] == r["centroid_id"]
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert assign[r["a_id"]] == r["centroid_id"] == assign[r["b_id"]]
        assert r["cosine"] >= t
    assert dominated, "fixture should actually prune something"


def test_pagerank_matches_python_model(spark):
    from fabrix_spark.operators import graph

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=4).collect()}

    # independent integer-recurrence model
    unit, d = 10**12, 85
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _t2 in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: unit // n for v in nodes}
    base = (unit // n) * (100 - d) // 100
    for _ in range(4):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += rank[u] // out[u]
        rank = {v: base + s[v] * d // 100 for v in nodes}
    assert got == rank
    # sanity: node 1 (3 in-edges) outranks node 5 (none)
    assert got[1] > got[5]


def test_pagerank_undirected_symmetry(spark):
    from fabrix_spark.operators import graph

    # a path graph 1-2-3: symmetric ends must tie, middle ranks highest
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    pr = {r["node"]: r["rank"] for r in graph.pagerank(graph.to_undirected(df)).collect()}
    assert pr[1] == pr[3]
    assert pr[2] > pr[1]


def test_kmv_distinct_exact_below_k_and_split_invariant(spark):
    from fabrix_spark.operators import profile as prof

    df = spark.range(2000).select((F.col("id") % 500).alias("v"))
    # fewer distinct than k → exact count
    r = prof.kmv_distinct(df, "v", k=1024).first()
    assert r["n_seen"] == 500 and r["est_distinct"] == 500.0
    # estimate path: k < distinct; invariant under partitioning/order
    a = prof.kmv_distinct(df, "v", k=64).first()
    b = prof.kmv_distinct(df.repartition(13).orderBy(F.rand(7)), "v", k=64).first()
    assert a["est_distinct"] == b["est_distinct"]  # bit-identical
    assert 350 <= a["est_distinct"] <= 700  # ~1/sqrt(64) error band
    # nulls excluded like count(DISTINCT)
    withnull = df.union(spark.sql("SELECT CAST(NULL AS BIGINT)"))
    r2 = prof.kmv_distinct(withnull, "v", k=1024).first()
    assert r2["n_seen"] == 500


def test_kmv_grouped_matches_global_per_group(spark):
    from fabrix_spark.operators import profile as prof

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 700).alias("v")
    )
    grouped = {
        r["g"]: r["est_distinct"]
        for r in prof.kmv_distinct_grouped(df, "v", by="g", k=32).collect()
    }
    for g in (0, 1, 2):
        solo = prof.kmv_distinct(df.filter(F.col("g") == g), "v", k=32).first()
        assert grouped[g] == solo["est_distinct"]


def test_check_constraints_report(spark):
    from fabrix_spark.operators import profile as prof

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "a", 0.0)],
        "k int, s string, v double",
    )
    rep = {
        (r["rule"], r["column"]): r
        for r in prof.check_constraints(
            df,
            [
                ("completeness", "s", 0.7),
                ("completeness", "k", 1.0),
                ("distinctness", "k", 1.0),
                ("non_negative", "v"),
                ("max", "v", 5.0),
                ("values_in", "s", ["a", "b"], 1.0),
            ],
        ).collect()
    }
    assert rep[("completeness", "s")]["metric"] == 0.75
    assert rep[("completeness", "s")]["passed"]
    assert rep[("completeness", "k")]["passed"]
    assert not rep[("distinctness", "k")]["passed"]  # 3/4 < 1.0
    assert not rep[("non_negative", "v")]["passed"]  # min = -1
    assert rep[("max", "v")]["passed"]
    # NULL counts as a domain miss
    assert rep[("values_in", "s")]["metric"] == 0.75
    assert not rep[("values_in", "s")]["passed"]
    with pytest.raises(ValueError, match="unknown constraint"):
        prof.check_constraints(df, [("bogus", "k", 1)]).collect()


def test_edit_distance_pairs_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, "kitten", "x"),
            (2, "sitten", "x"),   # dist 1 from kitten
            (3, "sitting", "x"),  # dist 2 from sitten, 3 from kitten
            (4, "kitten", "y"),   # other block: never paired with 1
            (5, "ki", "x"),       # length prefilter removes vs all x
        ],
        "id long, s string, blk string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["edit_distance"]
        for r in text.edit_distance_pairs(
            df, col="s", id_col="id", block="blk", max_dist=2
        ).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 2}


def test_cc_label_raises_past_iteration_budget(spark):
    # a path graph of diameter 6 cannot converge in 2 rounds — the
    # label strategy must REFUSE rather than silently split the chain
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(nodes, pairs, max_iterations=2).collect()
    # star handles the same graph within the budget
    got = dedup.dup_clusters(nodes, pairs, max_iterations=6, strategy="star").collect()
    assert {r["cluster_id"] for r in got} == {0}


def test_interleave_sources_ratio_and_determinism(spark):
    from fabrix_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else "b") for i in range(60)], "doc_id long, source string"
    )
    out = sampling.interleave_sources(df, weights={"a": 2.0}).collect()
    order = [r["source"] for r in sorted(out, key=lambda r: r["mix_order"])]
    # weight 2 source appears ~2x as often early in the schedule
    head = order[:30]
    assert head.count("a") == 20 and head.count("b") == 10
    assert sorted(r["mix_order"] for r in out) == list(range(1, 61))  # total, no gaps
    # determinism under re-partitioning
    again = sampling.interleave_sources(df.repartition(7), weights={"a": 2.0}).collect()
    assert {(r["doc_id"], r["mix_order"]) for r in again} == {
        (r["doc_id"], r["mix_order"]) for r in out
    }


def test_kmv_sketches_merge_exactly(spark):
    from fabrix_spark.operators import profile as prof

    df = spark.range(4000).select((F.col("id") % 900).alias("v"))
    halves = [df.filter(F.col("v") < 450), df.filter(F.col("v") >= 450)]
    merged = prof.kmv_merge_estimate(
        [prof.kmv_sketch(h, "v", k=64) for h in halves], k=64
    ).first()
    direct = prof.kmv_distinct(df, "v", k=64).first()
    assert merged["est_distinct"] == direct["est_distinct"]
    assert merged["n_seen"] == direct["n_seen"]


def test_hist_sketch_merge_and_quantiles(spark):
    """Mergeable histogram quantile sketch: build(shard union) ==
    merge(shard sketches) EXACTLY (bucket-for-bucket), the quantile
    answers agree, the estimate is within one bucket width of the
    exact order statistic, and everything is partition-invariant."""
    from fabrix_spark.operators import profile as prof

    base = spark.range(5000)
    shards = [
        base.filter(F.col("id") % 3 == i).select(((F.col("id") * 37) % 1000 / 10.0).alias("v"))
        for i in range(3)
    ]
    whole = base.select(((F.col("id") * 37) % 1000 / 10.0).alias("v"))

    direct = prof.hist_sketch(whole, "v", width=500)
    merged = prof.hist_merge([prof.hist_sketch(s, "v", width=500) for s in shards])
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))

    probs = (0.25, 0.5, 0.9)
    qd = {r["prob"]: r["est_lo"] for r in prof.hist_quantiles(direct, probs, width=500).collect()}
    qm = {r["prob"]: r["est_lo"] for r in prof.hist_quantiles(merged, probs, width=500).collect()}
    assert qd == qm and len(qd) == 3
    # error bound: one bucket width (500 quantized units = 5.0 in v)
    exact = whole.approxQuantile("v", list(probs), 0.0)
    for p, e in zip(probs, exact):
        assert abs(qd[p] / 100.0 - e) <= 5.0
    # partition invariance
    again = prof.hist_sketch(whole.repartition(13), "v", width=500)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, direct.collect()))


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """Candidate-and-verify heavy hitters: output equals the exact
    GROUP BY/HAVING answer (counts exact, no misses — the MG superset
    guarantee) and is identical under re-partitioning even though the
    intermediate candidate sets differ."""
    from fabrix_spark.operators.profile import heavy_hitters

    # skewed domain: item i appears (2000 // (i+1)) times — Zipf-ish
    rows = [(f"w{i}",) for i in range(200) for _ in range(2000 // (i + 1))]
    df = spark.createDataFrame(rows, "tok string")
    n = len(rows)
    phi = 0.01
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "tok", phi=phi).collect()}
    import math as _m

    thr = _m.ceil(n * phi)
    exact = {
        (r["tok"], r["c"])
        for r in df.groupBy("tok").agg(F.count("*").alias("c")).filter(F.col("c") >= thr).collect()
    }
    assert got == exact and got  # non-trivial and exactly right
    again = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df.repartition(17), "tok", phi=phi).collect()
    }
    assert again == exact


def test_ngram_lm_score_ref_mode_and_unseen(spark):
    """ref= mode trains the LM on a reference corpus; bigrams unseen
    in the reference get the add-one floor ln(1/(0+V)); scores are
    partition-invariant (integer micro-nat sums)."""
    import math as _m

    from fabrix_spark.operators.text import ngram_lm_score

    ref = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c d")], "doc_id long, text string"
    )
    probe = spark.createDataFrame([(10, "z z z")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_lm_score(probe, ref=ref).collect()}
    # ref bigrams: (a,b)x3 (b,a) (b,c)x2 (c,d); V = distinct w1 = {a,b,c} = 3
    # probe: (z,z)x2, each unseen: C12=0, C1=0 -> ln(1/3)
    r = out[10]
    assert r["n_bigrams"] == 2
    expect = round(round(_m.log(1 / 3) * 1e6) / 1e6, 6)
    assert abs(r["avg_logprob"] - expect) < 1e-9
    # self-mode partition invariance
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{(i + 1) % 5} tok{(i + 2) % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, ngram_lm_score(docs).collect()))
    b = sorted(map(tuple, ngram_lm_score(docs.repartition(11)).collect()))
    assert a == b


def _bmp_from_array(arr) -> bytes:
    """24bpp bottom-up BMP from an HxW grayscale uint8 array."""
    import struct as _struct

    h, w = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = int(arr[y, x])
            row += bytes([v, v, v])
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + info + pixels


def test_image_ahash_neardup(spark):
    import numpy as np

    from fabrix_spark.operators.multimodal import ahash_bmp, image_ahash

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(32, 32)).astype("uint8")
    near = base.copy()
    near[:2, :2] = 255 - near[:2, :2]  # tiny local edit
    other = rng.randint(0, 256, size=(32, 32)).astype("uint8")

    h_base = ahash_bmp(_bmp_from_array(base))
    h_near = ahash_bmp(_bmp_from_array(near))
    h_other = ahash_bmp(_bmp_from_array(other))
    d = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert d(h_base, h_near) <= 2
    assert d(h_base, h_other) > 10

    df = spark.createDataFrame(
        [
            (1, bytearray(_bmp_from_array(base))),
            (2, bytearray(_bmp_from_array(near))),
            (3, bytearray(_bmp_from_array(other))),
        ],
        "doc_id long, content binary",
    )
    sigs = image_ahash(df)
    got = {r["id"]: r["ahash"] for r in sigs.collect()}
    assert got == {1: h_base, 2: h_near, 3: h_other}
    pairs = dedup.hamming_pairs(
        sigs, sig_col="ahash", id_col="id", bits=64, bands=8, max_hamming=4
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_multimodal_null_payload_and_malformed_bmp(spark):
    """r17 self-review pins: (a) NULL payload rows are excluded by the
    mapInPandas decoders/hashers — bytes(None) previously died with a
    cryptic TypeError inside the Arrow worker; (b) BMP headers with
    nonpositive dimensions refuse loudly — a negative width made
    numpy's frombuffer count negative (reading the WHOLE buffer), a
    zero area emitted a silent NaN mean."""
    import struct

    import pytest as _pytest

    from fabrix_spark.operators.multimodal import (
        ahash_bmp,
        audio_fingerprints,
        decode_bmp,
        image_ahash,
        synthesize_wav,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"payload-bytes-here!!")), (2, None)],
        "doc_id long, content binary",
    )
    assert [r["id"] for r in image_ahash(df, fake=True).collect()] == [1]
    wav = synthesize_wav(
        df.withColumnRenamed("content", "payload"), payload_col="payload"
    )
    assert wav.count() == 1
    assert [r["id"] for r in audio_fingerprints(wav).collect()] == [1]

    # 24bpp uncompressed header with width = -4
    bad = bytearray(b"BM" + b"\x00" * 52)
    struct.pack_into("<I", bad, 10, 54)
    struct.pack_into("<ii", bad, 18, -4, 4)
    struct.pack_into("<H", bad, 28, 24)
    for fn in (decode_bmp, ahash_bmp):
        with _pytest.raises(ValueError, match="malformed BMP"):
            fn(bytes(bad))


def test_ahash_bytes_locality_and_exactness():
    """ahash_bytes: locality (small local edit -> small Hamming;
    unrelated payload -> far), edge cases, and the exact-integer tie
    rule (a uniform payload has NO block strictly above the mean)."""
    from fabrix_spark.operators.multimodal import ahash_bytes

    base = bytes(range(256)) * 4
    # Mean-preserving local edit: swap two bytes that live in different
    # blocks. The total sum (hence global mean) is unchanged, so only
    # the two touched blocks can legally flip -> exact bound of 2.
    # (A non-mean-preserving edit can flip a third, mean-adjacent block
    # because the *threshold* moves — aHash locality is approximate by
    # construction; see round-10 verdict.)
    swapped = bytearray(base)
    swapped[0], swapped[500] = swapped[500], swapped[0]
    near = bytearray(base)
    near[:3] = b"\xff\xff\xff"  # localized 3-byte edit (moves the mean)
    other = bytes(reversed(base))
    d = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert d(ahash_bytes(base), ahash_bytes(bytes(swapped))) <= 2
    d_near = d(ahash_bytes(base), ahash_bytes(bytes(near)))
    d_far = d(ahash_bytes(base), ahash_bytes(other))
    assert d_near < d_far / 3
    assert d_far > 10
    assert ahash_bytes(b"") == 0
    assert ahash_bytes(b"\x07" * 1000) == 0  # uniform: no block > mean
    # shorter than the 60 blocks: empty blocks contribute 0 bits, the
    # populated ones still compare exactly
    assert 0 <= ahash_bytes(b"\x00" * 5 + b"\xff" * 5) < (1 << 60)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),           # key
            st.integers(min_value=0, max_value=10_800),      # seconds offset (3h)
            st.integers(min_value=-1000, max_value=1000),    # value (int → exact)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_resample_ffill_matches_python_model(spark, rows):
    """Differential check of grid construction + forward fill against
    a direct python model, over random irregular multi-key series."""
    import datetime as dt

    from fabrix_spark.operators.temporal import resample_ffill

    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(seconds=s), float(v)) for k, s, v in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["grid_ts"]): r["value"]
        for r in resample_ffill(df).collect()
    }

    want = {}
    bykey = {}
    for k, ts, v in data:
        bykey.setdefault(k, []).append((ts, v))
    for k, obs in bykey.items():
        obs.sort()
        t0 = obs[0][0].replace(minute=0, second=0, microsecond=0)
        t1 = obs[-1][0].replace(minute=0, second=0, microsecond=0)
        g = t0
        while g <= t1:
            last = None
            for ts, v in obs:
                if ts <= g:
                    last = v
                else:
                    break
            want[(k, g)] = last
            g += dt.timedelta(hours=1)
    assert got == want


def test_chunk_documents_model(spark):
    words = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, words), (2, "a b c")], "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in text.chunk_documents(df, chunk_tokens=20, overlap=5).collect()
    }
    # doc 1: 50 tokens, step 15 → starts 0,15,30 (start 30 reaches the
    # end: ceil((50-20)/15) = 2 extra chunks)
    assert {k[1] for k in got if k[0] == 1} == {0, 1, 2}
    assert got[(1, 0)][1].split() == [f"w{i}" for i in range(20)]
    assert got[(1, 1)][1].split() == [f"w{i}" for i in range(15, 35)]
    assert got[(1, 2)] == (20, " ".join(f"w{i}" for i in range(30, 50)))
    # every token of doc 1 appears in some chunk (no suffix lost)
    covered = {w for (d, _), (_, c) in got.items() if d == 1 for w in c.split()}
    assert covered == {f"w{i}" for i in range(50)}
    # short doc: single whole chunk
    assert got[(2, 0)] == (3, "a b c")
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(df, chunk_tokens=8, overlap=8)


def test_kmeans_fast_trainer_matches_dataframe_trainer(spark, sf_dir):
    """kmeans_train_rows (driver-held centroids, numpy partial sums)
    must be bit-identical to the all-DataFrame Lloyd loop, and both
    assignment twins (literal-expression, Arrow-blocked numpy) must be
    bit-identical to the broadcast-join ivf_assign."""
    from fabrix_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    want = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in similarity._kmeans_train_df(emb, 8, 2, "vec_id", "embedding", 1_000_000).collect()
    )
    rows = similarity.kmeans_train_rows(emb, k=8, iters=2)
    assert want == sorted(rows)
    # kmeans_train delegates and agrees too
    assert want == sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in similarity.kmeans_train(emb, k=8, iters=2).collect()
    )
    cdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a_join = {r[0]: r[1] for r in similarity.ivf_assign(emb, cdf).collect()}
    a_expr = {r[0]: r[1] for r in similarity.ivf_assign_expr(emb, rows).collect()}
    a_np = {r[0]: r[1] for r in similarity.ivf_assign_blocked(emb, rows).collect()}
    assert a_join == a_expr == a_np


def test_semantic_dedup_fast_path_matches_join_path(spark, sf_dir):
    """The numpy fast path (blocked assignment + per-cluster matmul,
    margin pre-filter, exact F.round in Spark) emits the identical pair
    set and kept set as the expression/join path driven by explicit
    centroids."""
    from fabrix_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cdf = similarity.kmeans_train(emb, k=8, iters=1).localCheckpoint()
    old_pairs = sorted(
        tuple(r) for r in dedup.semantic_dup_pairs(emb, threshold=0.375, centroids=cdf).collect()
    )
    new_pairs = sorted(
        tuple(r) for r in dedup.semantic_dup_pairs(emb, k=8, iters=1, threshold=0.375).collect()
    )
    assert old_pairs == new_pairs and len(new_pairs) > 0
    old_keep = sorted(
        tuple(r) for r in dedup.semantic_prune(emb, threshold=0.375, centroids=cdf).collect()
    )
    new_keep = sorted(
        tuple(r) for r in dedup.semantic_prune(emb, k=8, iters=1, threshold=0.375).collect()
    )
    assert old_keep == new_keep


def test_np_round6_matches_spark_round(spark):
    """_np_round6 must reproduce F.round(x, 6) exactly, including the
    6-dp .5 boundaries where np.round (half-to-even) diverges."""
    import numpy as np
    from pyspark.sql import functions as F

    from fabrix_spark.operators.similarity import _np_round6, _round_half_up

    vals = [0.0640625, 0.1234565, -0.1234565, 0.9999995, -0.9999995,
            0.3333333333, 1.0000004999999998, 0.49999999999999994]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = [r["r"] for r in df.select(F.round("v", 6).alias("r")).collect()]
    got = list(_np_round6(np.asarray(vals)))
    assert got == want
    # integer-scale twin against F.round(x)
    want0 = [r["r"] for r in df.select(F.round("v").cast("long").alias("r")).collect()]
    got0 = [_round_half_up(v) for v in vals]
    assert got0 == want0


def test_sigstore_build_once_single_build_under_contention(spark, tmp_path):
    """Two concurrent build_once callers (the bench+verify race):
    exactly ONE builds, the other waits on the build lock and no-ops,
    and the store ends with a single committed version."""
    import threading
    import time as _time

    from fabrix_spark.operators.dedup import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"some document text number {i} with shared tokens") for i in range(30)],
        "doc_id long, text string",
    )
    built, results = [], []

    def mk_store():
        return SignatureStore(spark, str(tmp_path / "sigs"), buckets=4, retain=1, lock=True)

    def run():
        st = mk_store()  # each "process" gets its own store object
        orig = st.build

        def slow_build(d, text_col="text"):
            built.append(threading.get_ident())
            _time.sleep(0.4)  # widen the race window
            orig(d, text_col)

        st.build = slow_build
        results.append(st.build_once(docs))

    t1, t2 = threading.Thread(target=run), threading.Thread(target=run)
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert len(built) == 1            # only one thread entered build
    assert sorted(results) == [False, True]
    store = mk_store()
    assert store.read().count() == 30
    assert len(store.table.versions()) == 1  # one committed version


def test_pq_fast_trainer_and_encoder_match_dataframe_path(spark, sf_dir):
    """pq_train_rows (driver-held codebooks, one numpy job per Lloyd
    iteration for ALL subspaces) and the numpy encode fast path must be
    bit-identical to the per-subspace broadcast-join DataFrame path."""
    from pyspark.sql import functions as F

    from fabrix_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    want = sorted(
        (int(r["subspace"]), int(r["code"]), [int(x) for x in r["__c"]], int(r["__cn2"]))
        for r in similarity._pq_train_df(emb, 64, 4, 8, 2).collect()
    )
    rows = similarity.pq_train_rows(emb, 64, m=4, n_codes=8, iters=2)
    assert want == sorted(rows)
    cb = similarity.pq_train(emb, 64, m=4, n_codes=8, iters=1)
    fast = {(r[0], r[1]): r[2] for r in similarity.pq_encode(emb, cb, 64, m=4).collect()}
    # a non-integral id routes through the broadcast-join path
    emb_s = emb.withColumn("vec_id", F.col("vec_id").cast("string"))
    slow = {(int(r[0]), r[1]): r[2] for r in similarity.pq_encode(emb_s, cb, 64, m=4).collect()}
    assert fast == slow and len(fast) > 0


def test_metrics_and_graph_edge_contracts(spark):
    """r16 self-review pins for the metrics/graph families:
    (a) auc_one_vs_rest works for NEGATIVE class labels (the common
    ±1 labeling previously died in F.expr — stack parsed the
    value-embedded alias __p-1 as __p minus 1);
    (b) threshold_metrics treats a NULL positive predicate as a
    NEGATIVE, agreeing with the curve family (the row previously
    vanished from tp AND fp and was absorbed into tn);
    (c) calibration_bins excludes NaN scores (previously bin 0 counted
    them in n while their quantized sum dropped out);
    (d) empty thresholds/classes raise ValueError, not a stack() parse
    error; (e) pagerank excludes NULL-endpoint edges and refuses an
    empty edge list."""
    import math

    import pytest

    from fabrix_spark.operators.graph import pagerank
    from fabrix_spark.operators.metrics import (
        auc_one_vs_rest,
        calibration_bins,
        threshold_metrics,
    )

    # (a) ±1 labels == the same data relabeled to {0, 1}
    rows = [(0.9, 1), (0.8, -1), (0.7, 1), (0.4, -1), (0.2, 1), (0.1, -1)]
    df_pm = spark.createDataFrame(rows, "score double, label int")
    df_01 = spark.createDataFrame(
        [(s, 1 if l == 1 else 0) for s, l in rows], "score double, label int"
    )
    got = {r["cls"]: r["auc"] for r in auc_one_vs_rest(df_pm, "score", "label", [-1, 1]).collect()}
    want = {r["cls"]: r["auc"] for r in auc_one_vs_rest(df_01, "score", "label", [0, 1]).collect()}
    assert got[1] == want[1] and got[-1] == want[0]

    # (b) NULL predicate row scoring above threshold counts in fp
    dfn = spark.createDataFrame(
        [(0.9, 1), (0.8, None), (0.3, 0)], "score double, label int"
    )
    m = threshold_metrics(dfn, "score", F.col("label") == 1, [0.5]).collect()[0]
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (1, 1, 1, 0)

    # (c) NaN scores excluded from calibration bins
    dfnan = spark.createDataFrame(
        [(0.05, 1), (float("nan"), 1), (0.95, 0)], "score double, label int"
    )
    bins = {r["bin"]: r for r in calibration_bins(dfnan, "score", F.col("label") == 1).collect()}
    assert bins[0]["n"] == 1 and not math.isnan(bins[0]["mean_score"])
    assert sum(r["n"] for r in bins.values()) == 2

    # (d) loud validation instead of stack(0, ) parse errors
    with pytest.raises(ValueError, match="threshold"):
        threshold_metrics(dfn, "score", F.col("label") == 1, [])
    with pytest.raises(ValueError, match="class"):
        auc_one_vs_rest(df_pm, "score", "label", [])

    # (e) pagerank: NULL-endpoint edge excluded; empty graph refused
    e = spark.createDataFrame(
        [(None, "b"), ("a", "b")], "src string, dst string"
    )
    got_pr = sorted(
        (r["node"], r["rank"]) for r in pagerank(e, iters=2).collect()
    )
    want_pr = sorted(
        (r["node"], r["rank"])
        for r in pagerank(e.filter(F.col("src").isNotNull()), iters=2).collect()
    )
    assert got_pr == want_pr and all(n is not None for n, _ in got_pr)
    with pytest.raises(ValueError, match="empty"):
        pagerank(spark.createDataFrame([], "src string, dst string"))


def test_sampling_poisoned_group_weight_and_length_contracts(spark):
    """r17 self-review pins: (a) rebalance_groups / temperature_mixture
    exclude NULL-group rows BEFORE deriving the min count — GROUP BY
    collects NULLs into one group whose count joins the global MIN, so
    a single missing-group row collapsed n_min to 1 and downsampled
    the ENTIRE corpus (measured: zero rows survived); (b)
    weighted_sample drops NULL/NaN weights instead of dying at the
    ANSI long cast of round(NaN), keeps weight ≥ 1 rows and drops
    negative ones; (c) pack_sequences REFUSES NULL/nonpositive lengths
    loudly — a NULL length silently landed its document in pack NULL
    and a negative one walked the running offset backward, corrupting
    every later pack boundary in the shard."""
    import pytest as _pytest

    from fabrix_spark.operators import sampling as sp

    rows = [(i, "a") for i in range(100)] + [(i + 100, "b") for i in range(50)] + [(999, None)]
    tm = spark.createDataFrame(rows, "doc_id long, grp string")
    clean = spark.createDataFrame(rows[:-1], "doc_id long, grp string")
    got = sorted(map(tuple, sp.rebalance_groups(tm, "doc_id", "grp").collect()))
    want = sorted(map(tuple, sp.rebalance_groups(clean, "doc_id", "grp").collect()))
    assert got == want and len(got) > 0  # one NULL row must not change the sample
    assert sorted(map(tuple, sp.temperature_mixture(tm, "doc_id", "grp").collect())) == sorted(
        map(tuple, sp.temperature_mixture(clean, "doc_id", "grp").collect())
    )

    wdf = spark.createDataFrame(
        [(1, 0.5), (2, float("nan")), (3, -0.5), (4, 2.0), (5, None)],
        "doc_id long, p double",
    )
    kept = {r["doc_id"] for r in sp.weighted_sample(wdf, "doc_id", F.col("p")).collect()}
    assert 4 in kept and not kept & {2, 3, 5}

    pk = spark.createDataFrame([(1, 10), (2, None), (3, 20)], "doc_id long, n long")
    with _pytest.raises(Exception, match="must be > 0"):
        sp.pack_sequences(pk, "doc_id", "n", budget=16).collect()
    good = sp.pack_sequences(pk.filter("n is not null"), "doc_id", "n", budget=16)
    assert {r["doc_id"] for r in good.collect()} == {1, 3}


def test_sampling_null_key_contract(spark):
    """Uniform NULL-key contract across the hashing samplers (r16
    self-review): a NULL key cannot be deterministically attributed,
    so it is EXCLUDED — previously hash_split dumped every null-key
    row into the LAST-NAMED split (contaminating the eval cohort),
    bootstrap_metrics gave null-id rows multiplicity max_k in every
    replicate, and cap_per_group/token_budget_sample ranked null keys
    first in partition-dependent order. Also: interleave_sources
    refuses non-positive weights (a zero weight would FRONT-load the
    'excluded' source via null positions)."""
    import pytest

    from fabrix_spark.operators.sampling import (
        bootstrap_metrics,
        cap_per_group,
        hash_split,
        interleave_sources,
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(None, "g", 5.0), (1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0)],
        "id long, grp string, value double",
    )
    split = hash_split(df, "id", {"train": 0.5, "test": 0.5}).collect()
    assert len(split) == 3 and all(r["id"] is not None for r in split)

    reps = bootstrap_metrics(df, "id", "value", replicates=50).collect()
    # null id excluded: every replicate sees 3 rows, and no replicate's
    # n_samples carries the deterministic max_k=10 poisoning
    assert all(r["n_rows"] == 3 for r in reps)
    assert all(r["n_samples"] <= 3 * 10 and r["n_samples"] >= 0 for r in reps)
    total = sum(r["n_samples"] for r in reps)
    assert 0 < total < 50 * 10  # Poisson(1) mass, not max_k stuffing

    capped = cap_per_group(df, "id", "grp", n=2).collect()
    assert len(capped) == 2 and all(r["id"] is not None for r in capped)

    kept = token_budget_sample(
        df.withColumn("toks", F.lit(10)), "id", "grp", "toks", budget=20
    ).collect()
    assert all(r["id"] is not None for r in kept) and len(kept) == 2

    with pytest.raises(ValueError, match="must be > 0"):
        interleave_sources(
            df.withColumn("source", F.col("grp")),
            id_col="id",
            weights={"g": 0.0},
        )


def test_bootstrap_metrics_properties(spark):
    """Poisson-bootstrap invariants: partitioning-independent
    (deterministic hash draws), n_samples ≈ n_rows per replicate
    (E[Poisson(1)] = 1), replicate means spread around the true mean."""
    from fabrix_spark.operators.sampling import bootstrap_metrics

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("v")
    )
    a = sorted(map(tuple, bootstrap_metrics(df, "doc_id", "v", replicates=10).collect()))
    b = sorted(map(tuple, bootstrap_metrics(df.repartition(7), "doc_id", "v", replicates=10).collect()))
    assert a == b and len(a) == 10
    true_mean = 97 / 2 - 0.5 + 10 + 0.01  # ~ mean of (id % 97 + 10)
    for rep, n_rows, n_samples, _s, mean in a:
        assert n_rows == 2000
        assert 1800 < n_samples < 2200      # Poisson(1) total ~ N ± ~4.5σ
        assert abs(mean - true_mean) < 3    # replicate mean near truth
    means = [r[4] for r in a]
    assert len(set(means)) > 1              # replicates genuinely differ


def test_personalized_pagerank_model(spark):
    """Seeded teleport: hand-computed 4-node model — mass flows only
    from the seed; nodes unreachable from it stay at 0."""
    from fabrix_spark.operators import graph

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = dict(
        (r["node"], r["rank"])
        for r in graph.pagerank(edges, iters=2, seeds=seeds).collect()
    )
    # r0 = (1e12, 0, 0, 0); iter1: r(1)=.15e12, r(2)=.85e12;
    # iter2: r(1)=.15e12, r(2)=.85*.15e12, r(3)=.85*.85e12, r(4)=0
    assert got == {
        1: 150_000_000_000,
        2: 127_500_000_000,
        3: 722_500_000_000,
        4: 0,
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="redistribute with seeds"):
        graph.pagerank(edges, seeds=seeds, redistribute=True)
    with _pytest.raises(ValueError, match="non-empty seed"):
        graph.pagerank(edges, seeds=seeds.filter("node > 99"))


def _mk_wav(freqs, n=16000, rate=16000, amp=12000, noise=0):
    """Tiny PCM WAV: concatenated sine segments (one per freq)."""
    import io
    import math
    import struct as _struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        seg = n // len(freqs)
        data = []
        for k, f in enumerate(freqs):
            for i in range(seg):
                v = amp * math.sin(2 * math.pi * f * i / rate)
                # segment-dependent envelope so energies vary
                v *= 0.4 + 0.6 * ((k + 1) / len(freqs))
                if noise:
                    v += noise * math.sin(2 * math.pi * 13.7 * i / rate + k)
                data.append(int(max(-32768, min(32767, v))))
        w.writeframes(_struct.pack(f"<{len(data)}h", *data))
    return buf.getvalue()


def test_audio_fingerprint_near_and_far(spark):
    """Energy-delta fingerprint: a gain-scaled/noised copy of a clip
    stays within a few Hamming bits; a different melody is far. The
    banded hamming join then pairs only the near-dups."""
    from fabrix_spark.operators.dedup import hamming_pairs
    from fabrix_spark.operators.multimodal import (
        audio_fingerprint_wav,
        audio_fingerprints,
    )

    a = _mk_wav([220, 440, 330, 550, 392, 494, 262, 587])
    a2 = _mk_wav([220, 440, 330, 550, 392, 494, 262, 587], amp=9000, noise=150)
    b = _mk_wav([550, 262, 494, 220, 587, 330, 440, 392])
    fa, fa2, fb = (audio_fingerprint_wav(x) for x in (a, a2, b))
    near = bin((fa ^ fa2) & ((1 << 64) - 1)).count("1")
    far = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
    assert near <= 6 < far

    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(a2)), (3, bytearray(b))],
        "doc_id long, content binary",
    )
    fps = audio_fingerprints(df)
    got = {r["id"]: r["afp"] for r in fps.collect()}
    assert got == {1: fa, 2: fa2, 3: fb}
    pairs = hamming_pairs(
        fps.withColumnRenamed("afp", "sig"), sig_col="sig", id_col="id",
        bits=64, bands=8, max_hamming=6,
    )
    assert sorted((r[0], r[1]) for r in pairs.collect()) == [(1, 2)]


def test_audio_fingerprint_rejects_non_wav():
    import pytest as _pytest

    from fabrix_spark.operators.multimodal import audio_fingerprint_wav

    with _pytest.raises(NotImplementedError, match="compressed audio"):
        audio_fingerprint_wav(b"\xff\xfbsome-mp3-ish-bytes")


def test_mmr_rerank_degenerate_pools(spark):
    """Fewer candidates than k: selection just stops when the pool is
    exhausted (no nulls, no duplicates); step order stays greedy."""
    from fabrix_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = mmr_rerank(emb, q, k=5, pool=10, lam=0.7).collect()
    picked = [(r["step"], r["c_id"]) for r in sorted(out, key=lambda r: r["step"])]
    assert len(picked) == 2                      # only 2 candidates exist
    assert len({c for _, c in picked}) == 2      # no duplicates
    assert [s for s, _ in picked] == [1, 2]


def test_overlap_pairs_model(spark):
    """Continuation pairs: suffix(a) == prefix(b); short docs skipped;
    self-pairs excluded; direction matters (a continues INTO b)."""
    from fabrix_spark.operators.dedup import overlap_pairs

    df = spark.createDataFrame(
        [
            (1, "x y z a b c"),          # ends with "a b c"
            (2, "a b c d e f"),          # starts with "a b c"  → (1, 2)
            (3, "a b c"),                # 3 tokens < 2k: skipped entirely
            (4, "q r s t u v"),          # no overlap with anything
        ],
        "doc_id long, text string",
    )
    got = sorted((r["a_id"], r["b_id"], r["overlap"]) for r in overlap_pairs(df, k=3).collect())
    assert got == [(1, 2, "a b c")]
    # direction: 2 does NOT continue into 1
    assert (2, 1) not in {(a, b) for a, b, _ in got}


def test_overlap_pairs_hot_boundary_guard(spark):
    """A boundary string shared by many docs is dropped when its
    document frequency exceeds max_df (quadratic-pair protection);
    max_df=None keeps everything."""
    from fabrix_spark.operators.dedup import overlap_pairs

    rows = [(i, f"u{i} v{i} w{i} the end x") for i in range(10)]  # all END "the end x"
    rows.append((100, "the end x continues here now"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = overlap_pairs(df, k=3, max_df=5).collect()
    assert guarded == []  # hot suffix (df=10 > 5) dropped
    open_ = overlap_pairs(df, k=3, max_df=None).collect()
    assert len(open_) == 10  # every hot doc pairs into 100


def test_fuzzy_pairs_model(spark):
    """Edit-distance blocking + verification semantics: a prefix-shared
    near-dup and a suffix-shared near-dup are both found with their
    exact Levenshtein distances; a pair edited away at BOTH ends is
    missed (the documented blocking recall contract); a pair over the
    percent threshold is verified but rejected."""
    from fabrix_spark.operators.dedup import fuzzy_pairs

    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, base, "en"),
        (2, base.replace("delta", "delt0"), "en"),    # 1 edit, shares prefix+suffix
        (3, "XXXXX" + base[5:], "en"),                # shares suffix only
        (4, base[:-4] + "QQQQ", "en"),                # shares prefix only
        # both ends rewritten beyond key_len chars: never a candidate
        (5, "ZZZZZZZZZZZZZZZZ" + base[16:-16] + "YYYYYYYYYYYYYYYY", "en"),
        (6, "totally different words here entirely", "en"),
        (7, base, "fr"),                               # other language scope
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["dist"], r["max_len"])
        for r in fuzzy_pairs(df, key_len=8, pct_threshold=30).collect()
    }
    assert (1, 2) in got and got[(1, 2)][0] == 1
    assert (1, 3) in got and got[(1, 3)][0] == 5
    assert (1, 4) in got and got[(1, 4)][0] == 4
    assert (2, 3) in got  # transitively near via 1: 6 edits, still <=30%
    assert all(5 not in pair and 6 not in pair and 7 not in pair for pair in got)
    # tighten the threshold: only the single-edit pair survives the verify
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(df, key_len=8, pct_threshold=5).collect()
    }
    assert tight == {(1, 2)}


def test_fuzzy_pairs_sorted_prefix_generator(spark):
    """The opt-in token-sorted blocking generator catches the
    both-ends-edited pairs the positional prefix/suffix generators
    miss by design: a doc whose FIRST and LAST tokens both changed
    (beyond key_len chars of divergence) shares no positional key,
    but its token-sorted prefix is unchanged as long as the
    lexicographically-smallest tokens survive the edit. The default
    generator pair must keep missing it (oracle semantics pinned),
    and an unknown generator name refuses loudly."""
    import pytest as _pytest

    from fabrix_spark.operators.dedup import fuzzy_pairs

    a = "omega beta gamma delta epsilon zeta"
    b = "sigma beta gamma delta epsilon tau"  # both ends edited
    rows = [(1, a, "en"), (2, b, "en"),
            (3, "totally different words here entirely", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    missed = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(df, key_len=8, pct_threshold=30).collect()
    }
    assert missed == set()  # positional generators: recall bound
    found = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_pairs(
            df,
            key_len=8,
            pct_threshold=30,
            generators=("prefix", "suffix", "sorted_prefix"),
        ).collect()
    }
    assert (1, 2) in found and found[(1, 2)] == 7
    with _pytest.raises(ValueError, match="unknown blocking generators"):
        fuzzy_pairs(df, generators=("prefix", "md5"))
    with _pytest.raises(ValueError, match="duplicate blocking generators"):
        fuzzy_pairs(df, generators=("prefix", "prefix"))

    # edge-whitespace robustness: trim strips spaces only, so a
    # leading tab survives into norm — the sorted key must drop the
    # empty edge token split() produces, or the tabbed twin's key
    # gains a phantom leading space and never blocks with its pair
    rows2 = [(1, "\t" + a, "en"), (2, a, "en")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, lang string")
    tabbed = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(
            df2, key_len=8, pct_threshold=30, generators=("sorted_prefix",)
        ).collect()
    }
    assert tabbed == {(1, 2)}


def test_fuzzy_pairs_block_purge(spark):
    """Blocks larger than block_cap are purged entirely (hot stock
    opening — quadratic-pair protection), and purging one generator
    does not disable the other."""
    from fabrix_spark.operators.dedup import fuzzy_pairs

    # 5 docs share the hot prefix; two of them also share a distinct
    # suffix block, so the pair survives via the suffix generator.
    rows = [
        (i, "common opening here " + f"unique tail {i} " * 3 + f"end{i}", "en")
        for i in range(5)
    ]
    # doc 1 = doc 0 with ONE mid-string substitution: identical 20-char
    # prefix (inside the hot block) AND identical 20-char suffix
    rows[1] = (
        1,
        "common opening here " + "unique tDil 0 " + "unique tail 0 " * 2 + "end0",
        "en",
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    purged = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(df, key_len=20, block_cap=4, pct_threshold=30).collect()
    }
    assert purged == {(0, 1)}  # prefix block (5 > 4) purged; suffix pair found
    open_ = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(df, key_len=20, block_cap=64, pct_threshold=30).collect()
    }
    assert (0, 1) in open_ and len(open_) >= 1


def test_fuzzy_pairs_short_text_cross_engine_parity(spark):
    """Pin the SHORT-TEXT blocking-key semantics across BOTH engines
    (the r14 verdict's open edge): Spark derives the suffix key with
    ``substring(norm, -key_len, key_len)`` whose negative-position
    clamping for texts shorter than ``key_len`` was fuzz-pinned only
    against Python, while the DuckDB oracle pattern writes
    ``substr(norm, length(norm)-15, 16)`` — a DIFFERENT engine's
    negative-start clamping rule. Both resolve to the WHOLE text for
    short inputs (verified here), so a corpus with short documents
    cannot silently diverge the oracle from the operator. The fixture
    covers: below/at/above the 16-char key boundary, a 1-char text,
    an exact short duplicate, a short near-dup (which BOTH engines
    identically miss — for texts shorter than ``key_len`` the prefix
    and suffix keys are the whole text, so only exact-equal short
    texts block together: the recall contract at its sharpest), and a
    short-vs-long prefix collision."""
    import duckdb

    from fabrix_spark.operators.dedup import fuzzy_pairs

    rows = [
        (1, "tiny doc!", "en"),                # len 9  < key_len
        (2, "tiny doc!", "en"),                # exact short duplicate
        (3, "x", "en"),                        # 1-char text
        (4, "0123456789abcde", "en"),          # len 15 (boundary - 1)
        (5, "0123456789abcdef", "en"),         # len 16 (exactly key_len)
        (6, "0123456789abcdefg", "en"),        # len 17 (boundary + 1)
        # long doc sharing the short docs' prefix: the SHORT doc's
        # whole-text key must NOT collide with the long doc's 16-char
        # prefix key unless they are actually equal
        (7, "tiny doc! plus a much longer continuation of text", "en"),
        (8, "tiny doc!", "fr"),                # scope: other language
        (9, "tiny doc?", "en"),                # near-dup of 1: MISSED
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"], r["max_len"])
        for r in fuzzy_pairs(
            df, key_len=16, block_cap=64, pct_threshold=30
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            r"""
WITH d AS (
  SELECT doc_id, lang, trim(text) AS norm FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
k AS (
  SELECT doc_id, lang, norm,
         substr(norm, 1, 16) AS pre,
         substr(norm, length(norm) - 15, 16) AS suf
  FROM d
),
blocked AS (
  SELECT *, count(*) OVER (PARTITION BY lang, pre) AS n_pre,
            count(*) OVER (PARTITION BY lang, suf) AS n_suf
  FROM k
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.pre = b.pre AND a.doc_id < b.doc_id
  WHERE a.n_pre BETWEEN 2 AND 64
  UNION
  SELECT a.doc_id, b.doc_id
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.suf = b.suf AND a.doc_id < b.doc_id
  WHERE a.n_suf BETWEEN 2 AND 64
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.norm, db.norm) AS BIGINT) AS dist,
       CAST(greatest(length(da.norm), length(db.norm)) AS BIGINT) AS max_len
FROM cand c
JOIN k da ON c.doc_a = da.doc_id
JOIN k db ON c.doc_b = db.doc_id
WHERE 100 * levenshtein(da.norm, db.norm)
      <= 30 * greatest(length(da.norm), length(db.norm))
"""
        ).fetchall()
    )
    assert got == want
    # pairs are actually FOUND by both engines (the parity above would
    # also hold on two empty results): the exact short duplicate and
    # the at-boundary 16/17-char prefix pair
    assert (1, 2, 0, 9) in got
    assert (5, 6, 1, 17) in got
    # and the short NEAR-dup is identically missed on both engines —
    # whole-text blocking keys admit only exact short duplicates
    assert not any(9 in (a, b) for a, b, _, _ in got)


def test_fuzzy_pairs_sorted_prefix_cross_engine_parity(spark):
    """Oracle story for the OPT-IN sorted_prefix generator (the r15
    verdict's optional #8: have the cross-engine recipe ready the day
    someone stages it): fuzzy_pairs with generators=("prefix",
    "suffix", "sorted_prefix") must match a DuckDB rendering where the
    third key is the first 16 chars of the token-SORTED text
    (list_sort over \\s+-split tokens with empty edge tokens dropped —
    the exact empty-token rule the operator documents for
    leading-tab/newline texts, exercised here by a leading-tab row).
    The fixture's both-ends-edited pair is caught ONLY by the sorted
    key (its lexicographically-smallest tokens are intact) and is
    verified MISSED by the default two-generator recipe — the recall
    case the opt-in exists for."""
    import duckdb

    from fabrix_spark.operators.dedup import fuzzy_pairs

    rows = [
        # both ends edited within key_len: prefix AND suffix keys
        # diverge, the sorted key ("apple common her…") is stable
        (1, "zebra apple common middle words here okay", "en"),
        (2, "zebrA apple common middle words here okaY", "en"),
        # plain prefix pair — the default passes still fire alongside
        (3, "0123456789abcdefgh shared prefix pair one", "en"),
        (4, "0123456789abcdefgh shared prefix pair onE", "en"),
        # leading tab survives trim (spaces only) and must NOT shift
        # the sorted key (the empty edge token is dropped) — this pair
        # is also both-ends-edited, caught only via sorted_prefix
        (5, "\tzulu banana shared core tokens fine today", "en"),
        (6, "zulU banana shared core tokens fine todaY", "en"),
        (7, "completely different unrelated content entirely", "en"),
    ]
    gens = ("prefix", "suffix", "sorted_prefix")
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"], r["max_len"])
        for r in fuzzy_pairs(
            df, key_len=16, block_cap=64, pct_threshold=30, generators=gens
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            r"""
WITH d AS (
  SELECT doc_id, lang, trim(text) AS norm FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
k AS (
  SELECT doc_id, lang, norm,
         substr(norm, 1, 16) AS pre,
         substr(norm, length(norm) - 15, 16) AS suf,
         substr(array_to_string(list_sort(list_filter(
             string_split_regex(norm, '\s+'), t -> t <> '')), ' '),
           1, 16) AS srt
  FROM d
),
blocked AS (
  SELECT *, count(*) OVER (PARTITION BY lang, pre) AS n_pre,
            count(*) OVER (PARTITION BY lang, suf) AS n_suf,
            count(*) OVER (PARTITION BY lang, srt) AS n_srt
  FROM k
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.pre = b.pre AND a.doc_id < b.doc_id
  WHERE a.n_pre BETWEEN 2 AND 64
  UNION
  SELECT a.doc_id, b.doc_id
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.suf = b.suf AND a.doc_id < b.doc_id
  WHERE a.n_suf BETWEEN 2 AND 64
  UNION
  SELECT a.doc_id, b.doc_id
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.srt = b.srt AND a.doc_id < b.doc_id
  WHERE a.n_srt BETWEEN 2 AND 64
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.norm, db.norm) AS BIGINT) AS dist,
       CAST(greatest(length(da.norm), length(db.norm)) AS BIGINT) AS max_len
FROM cand c
JOIN k da ON c.doc_a = da.doc_id
JOIN k db ON c.doc_b = db.doc_id
WHERE 100 * levenshtein(da.norm, db.norm)
      <= 30 * greatest(length(da.norm), length(db.norm))
"""
        ).fetchall()
    )
    assert got == want
    pairs = {(a, b) for a, b, _, _ in got}
    assert (1, 2) in pairs and (5, 6) in pairs and (3, 4) in pairs
    # the default two-generator recipe misses both both-ends pairs —
    # the documented blocking tradeoff sorted_prefix exists to close
    base = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_pairs(
            df, key_len=16, block_cap=64, pct_threshold=30
        ).collect()
    }
    assert (1, 2) not in base and (5, 6) not in base and (3, 4) in base


def test_mmr_rerank_matches_python_model(spark):
    """Independent check of the greedy MMR trajectory: a pure-Python
    reference (exact int dots, decimal-rounded cosines, same
    tie-breaks) must produce the identical (step, c_id) sequence per
    query on random-ish vectors."""
    import decimal
    import math

    from fabrix_spark.operators.similarity import mmr_rerank

    def r6(x):
        return float(decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))

    dim, n = 6, 12
    vecs = {
        i: [((i * 7 + j * 13) % 11 - 5) / 7.0 for j in range(dim)] for i in range(n)
    }
    q = {i: round(v * 1_000_000) for i, v in enumerate(vecs[0])}  # irrelevant
    qv = {i: [round(x * 1_000_000) for x in v] for i, v in vecs.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(qv[a], qv[b]))
        na = sum(x * x for x in qv[a])
        nb = sum(x * x for x in qv[b])
        return r6(d / math.sqrt(float(na) * float(nb)))

    def model(q_id, k=4, pool=8, lam=0.7):
        cands = sorted(
            ((cos(q_id, c), c) for c in vecs if c != q_id),
            key=lambda t: (-t[0], t[1]),
        )[:pool]
        rel = {c: s for s, c in cands}
        sel = [min(((-s, c) for s, c in cands))[1]]
        remaining = [c for _, c in cands if c != sel[0]]
        while len(sel) < k and remaining:
            best = None
            for c in remaining:
                msim = max(cos(c, s) for s in sel)
                score = 0.7 * rel[c] - (1.0 - 0.7) * msim
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            sel.append(best[1])
            remaining.remove(best[1])
        return sel

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") < 3)
    out = mmr_rerank(df, queries, k=4, pool=8, lam=0.7).collect()
    got = {}
    for r in out:
        got.setdefault(r["q_id"], []).append((r["step"], r["c_id"]))
    for q_id in (0, 1, 2):
        want = [(s + 1, c) for s, c in enumerate(model(q_id))]
        assert sorted(got[q_id]) == want, (q_id, sorted(got[q_id]), want)


def test_triangle_counts_known_graphs(spark):
    from fabrix_spark.operators.graph import triangle_counts

    # K4 + disjoint edge: every K4 node in 3 triangles; edge nodes in none
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6)],
        "src long, dst long",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(k4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # star graph: no triangles at all, any hub degree
    star = spark.createDataFrame([(0, i) for i in range(1, 30)], "src long, dst long")
    assert triangle_counts(star).count() == 0
    # duplicate + reversed edges collapse before counting
    dup = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    out2 = {r["node"]: r["n_triangles"] for r in triangle_counts(dup).collect()}
    assert out2 == {1: 1, 2: 1, 3: 1}


def test_psi_drift_identical_and_shifted(spark):
    """PSI over identical cohorts is exactly 0 in every bin; a shifted
    cohort produces a positive index; empty bins stay finite via
    add-one smoothing (both directions)."""
    from fabrix_spark.operators.profile import psi_drift

    a = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "bin string")
    same = psi_drift(a, a, "bin").collect()
    assert all(r["psi_term_micro"] == 0 for r in same)

    b = spark.createDataFrame([("x",)] * 90 + [("z",)] * 10, "bin string")
    rows = {r["bin"]: r for r in psi_drift(a, b, "bin").collect()}
    assert set(rows) == {"x", "y", "z"}  # union of bins, zero-filled
    assert rows["y"]["n_b"] == 0 and rows["z"]["n_a"] == 0
    psi = sum(r["psi_term_micro"] for r in rows.values()) / 1e6
    assert psi > 0.25  # a half-mass swap is a major shift


def test_min_label_propagation_converges_to_components(spark):
    """With enough rounds min-label propagation IS connected
    components (every node gets its component's min id); fewer rounds
    bound label travel to that many hops."""
    from fabrix_spark.operators.graph import min_label_propagation

    # two components: a 4-chain {1-2-3-4} and a triangle {10,11,12}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    done = {r["node"]: r["label"] for r in min_label_propagation(edges, iters=3).collect()}
    assert done == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
    # one round: label 1 has only reached node 2 (one hop)
    one = {r["node"]: r["label"] for r in min_label_propagation(edges, iters=1).collect()}
    assert one[2] == 1 and one[3] == 2 and one[4] == 3


def test_cosine_range_search_matches_topk_scores(spark):
    """Range search returns exactly the pairs cosine_topk scores at or
    above the radius (same quantized math), with a shuffle-free plan."""
    from fabrix_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 4)
    rng = similarity.cosine_range_search(emb, qs, threshold=0.3)
    got = sorted(map(tuple, rng.collect()))
    big_k = similarity.cosine_topk(emb, qs, k=10**6).drop("rank")
    want = sorted(
        map(tuple, big_k.filter(F.col("cosine") >= 0.3).collect())
    )
    assert got == want and got
    plan = rng._jdf.queryExecution().executedPlan().toString()
    # no ranking window and no keyed shuffle — the only exchanges are
    # the broadcast of the query side and spread()'s round-robin
    # re-split of the small scan (parallelism, not data movement by key)
    assert "Window" not in plan
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_psi_drift_quantization_parity_fuzz(spark):
    """Differential fuzz of the micro-nat quantization recipe: for
    random count tables, psi_drift's per-bin int64 terms equal DuckDB
    computing the identical expression — pinning that round(x*1e6)
    and ln() over exactly-representable integer products agree
    cross-engine (the recipe every micro-nat query relies on)."""
    import random

    import duckdb

    from fabrix_spark.operators.profile import psi_drift

    rng = random.Random(7)
    for _ in range(6):
        nb = rng.randint(1, 6)
        bins = [f"b{i}" for i in range(nb)]
        rows_a = [(b,) for b in bins for _ in range(rng.randint(0, 40))] or [("b0",)]
        rows_b = [(b,) for b in bins for _ in range(rng.randint(0, 40))] or [("b0",)]
        a = spark.createDataFrame(rows_a, "bin string")
        b = spark.createDataFrame(rows_b, "bin string")
        got = {r["bin"]: (r["n_a"], r["n_b"], r["psi_term_micro"])
               for r in psi_drift(a, b, "bin").collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE ta(bin VARCHAR); CREATE TABLE tb(bin VARCHAR)")
        con.executemany("INSERT INTO ta VALUES (?)", rows_a)
        con.executemany("INSERT INTO tb VALUES (?)", rows_b)
        want = {r[0]: (r[1], r[2], r[3]) for r in con.execute("""
WITH a AS (SELECT bin, count(*) AS n_a FROM ta GROUP BY 1),
b AS (SELECT bin, count(*) AS n_b FROM tb GROUP BY 1),
j AS (SELECT coalesce(a.bin, b.bin) AS bin, coalesce(n_a,0) AS n_a, coalesce(n_b,0) AS n_b
      FROM a FULL OUTER JOIN b ON a.bin = b.bin),
t AS (SELECT sum(n_a+1) AS ta, sum(n_b+1) AS tb FROM j)
SELECT j.bin, CAST(j.n_a AS BIGINT), CAST(j.n_b AS BIGINT),
       CAST(round((((j.n_a+1)/CAST(t.ta AS DOUBLE)) - ((j.n_b+1)/CAST(t.tb AS DOUBLE)))
            * (ln((j.n_a+1)*CAST(t.tb AS DOUBLE)) - ln((j.n_b+1)*CAST(t.ta AS DOUBLE))) * 1000000) AS BIGINT)
FROM j CROSS JOIN t""").fetchall()}
        assert got == want


def test_chi2_contingency_matches_python_reference(spark):
    """chi2_contingency == an exact Python-int replay of the split
    integral division on random contingency tables, converges to the
    float chi-square, is ~0 for an independent pair, and excludes NULL
    categories."""
    import random
    from collections import Counter

    from fabrix_spark.operators.profile import chi2_contingency

    rng = random.Random(61)
    rows = [
        (rng.choice("xyz"), rng.choice("pqrs")) for _ in range(300)
    ]
    df = spark.createDataFrame(
        rows + [(None, "p"), ("x", None)], "a string, b string"
    )
    got = {
        (r["a"], r["b"]): (r["observed"], r["term_q"])
        for r in chi2_contingency(df, "a", "b").collect()
    }
    o = Counter(rows)
    n = len(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    want = {}
    fl = 0.0
    for a in ra:  # DENSE grid — zero cells contribute e each
        for b in cb:
            ob = o.get((a, b), 0)
            d = ob * n - ra[a] * cb[b]
            m = n * ra[a] * cb[b]
            want[(a, b)] = (
                ob,
                (d * d // m) * 1_000_000 + ((d * d % m) * 1_000_000) // m,
            )
            e = ra[a] * cb[b] / n
            fl += (ob - e) ** 2 / e
    assert got == want
    chi2 = sum(t for _, t in got.values()) / 1e6
    assert abs(chi2 - fl) < 1e-4  # truncation loses < 1µ per cell

    # a column associated with itself maxes out; duplicated-column
    # association is (k-1)·n in the chi2 statistic for k classes —
    # each of the k² cells truncates at most 1 micro-unit below exact
    same = spark.createDataFrame([(c, c) for c in "xxyyzz"], "a string, b string")
    terms = chi2_contingency(same, "a", "b").collect()
    exact = (3 - 1) * 6 * 1_000_000
    assert exact - 9 <= sum(r["term_q"] for r in terms) <= exact
    assert len(terms) == 9  # the DENSE grid: zero cells present


def test_mutual_information_matches_python_reference(spark):
    """mutual_information == the float reference computed with the
    identical op chain on random contingency tables; identical columns
    give I = H(X) (the self-information ceiling); independent uniform
    columns give ~0."""
    import math
    import random
    from collections import Counter

    from fabrix_spark.operators.profile import mutual_information
    from fabrix_spark.operators.similarity import _round_half_up

    rng = random.Random(71)
    rows = [(rng.choice("xy"), rng.choice("pqr")) for _ in range(240)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["observed"], r["mi_term_micro"])
        for r in mutual_information(df, "a", "b").collect()
    }
    o = Counter(rows)
    n = len(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    want = {
        (a, b): (
            ob,
            _round_half_up(
                (ob / n)
                * (math.log(ob * n) - math.log(ra[a] * cb[b]))
                * 1_000_000.0
            ),
        )
        for (a, b), ob in o.items()
    }
    assert got == want

    same = spark.createDataFrame(
        [(c, c) for c in "xxxyyz"], "a string, b string"
    )
    mi = sum(
        r["mi_term_micro"] for r in mutual_information(same, "a", "b").collect()
    ) / 1e6
    h = -(3 / 6 * math.log(3 / 6) + 2 / 6 * math.log(2 / 6) + 1 / 6 * math.log(1 / 6))
    assert abs(mi - h) < 1e-5  # I(X;X) = H(X)


def test_psi_drift_disjoint_support_fuzz(spark):
    """Add-one smoothing's edge case (r12 verdict #8): cohorts with
    COMPLETELY disjoint bin supports — every joined bin has n_a = 0 or
    n_b = 0, so the unsmoothed PSI would be ±inf in every term. The
    smoothed terms must stay finite, be strictly positive (same-sign
    product: mass present on exactly one side always reads as drift),
    and equal a pure-Python replay of the identical IEEE double
    expression."""
    import math
    import random

    from fabrix_spark.operators.profile import psi_drift
    from fabrix_spark.operators.similarity import _round_half_up

    rng = random.Random(13)
    for _ in range(4):
        na_bins = {f"a{i}": rng.randint(1, 50) for i in range(rng.randint(1, 5))}
        nb_bins = {f"b{i}": rng.randint(1, 50) for i in range(rng.randint(1, 5))}
        a = spark.createDataFrame(
            [(b,) for b, n in na_bins.items() for _ in range(n)], "bin string"
        )
        b = spark.createDataFrame(
            [(b,) for b, n in nb_bins.items() for _ in range(n)], "bin string"
        )
        got = {
            r["bin"]: (r["n_a"], r["n_b"], r["psi_term_micro"])
            for r in psi_drift(a, b, "bin").collect()
        }
        joined = {**{k: (v, 0) for k, v in na_bins.items()},
                  **{k: (0, v) for k, v in nb_bins.items()}}
        ta = sum(v[0] + 1 for v in joined.values())
        tb = sum(v[1] + 1 for v in joined.values())
        want = {}
        for k, (n_a, n_b) in joined.items():
            sa, sb = float(n_a + 1), float(n_b + 1)
            term = (sa / ta - sb / tb) * (
                math.log(sa * tb) - math.log(sb * ta)
            )
            want[k] = (n_a, n_b, _round_half_up(term * 1000000.0))
        assert got == want
        assert all(t >= 0 for _, _, t in got.values())
        # disjoint mass on both sides -> at least one strictly positive
        assert any(t > 0 for _, _, t in got.values())


def test_jaccard_auto_method_selection(spark):
    """method='auto' applies the measured df-based switch rule: a
    benign corpus picks the inverted index; a corpus dominated by one
    hot shingle (every doc shares a boilerplate preamble) picks prefix
    filtering. Both produce the exact pair set either way."""
    from fabrix_spark.operators import dedup

    benign = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    got_auto = sorted(map(tuple, dedup.jaccard_pairs(benign, threshold=0.2, method="auto").collect()))
    got_inv = sorted(map(tuple, dedup.jaccard_pairs(benign, threshold=0.2).collect()))
    assert got_auto == got_inv

    # hot corpus: identical 6-token preamble in every doc -> the
    # preamble shingles have df == n_docs, so max_df^2 >> 10 * sum(|set|)
    hot = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to everything here "),
            F.col("id").cast("string"), F.lit(" unique tail "),
            (F.col("id") * 7 % 13).cast("string"),
        ).alias("text"),
    )
    a = sorted(map(tuple, dedup.jaccard_pairs(hot, threshold=0.5, method="auto").collect()))
    b = sorted(map(tuple, dedup.jaccard_pairs(hot, threshold=0.5, method="prefix").collect()))
    c = sorted(map(tuple, dedup.jaccard_pairs(hot, threshold=0.5).collect()))
    assert a == b == c  # exact recall regardless of chosen path

    # the decision itself, on each corpus's shingle sets
    from fabrix_spark.operators.dedup import _choose_exact_method, _shingle_sets

    assert _choose_exact_method(_shingle_sets(benign, "text", "doc_id", 3)) == "inverted"
    assert _choose_exact_method(_shingle_sets(hot, "text", "doc_id", 3)) == "prefix"


def test_decontaminate_semantic_overlapping_id_spaces(spark):
    """Corpus and benchmark are INDEPENDENT tables, so an id collision
    between them (both zero-based) is a real pair that must still be
    probed — the r9 implementation inherited cosine_range_search's
    self-pair exclusion and silently reported contaminated=false for
    colliding ids. Corpus id 0 here is an exact copy of benchmark id 0
    and MUST flag."""
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    benchmark = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["contaminated"], r["max_benchmark_cosine"])
        for r in dedup.decontaminate_semantic(corpus, benchmark, threshold=0.9).collect()
    }
    assert got[0] == (True, 1.0)  # the colliding id IS probed
    assert got[1] == (False, -1.0)


def test_cosine_range_search_exclude_self_and_null_ids(spark):
    """exclude_self=True (self-search) drops only true self-pairs;
    exclude_self=False probes id collisions. NULL-id rows must not be
    silently dropped from the broadcast pairing (the old join key was
    NULL for NULL ids)."""
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (None, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")

    self_search = similarity.cosine_range_search(vecs, q, threshold=0.5)
    got = {r["c_id"] for r in self_search.collect()}
    assert got == {1, None}  # 0 excluded as self; NULL-id row kept

    both = similarity.cosine_range_search(vecs, q, threshold=0.5, exclude_self=False)
    assert {r["c_id"] for r in both.collect()} == {0, 1, None}


def test_fixed_size_sample_null_keys_excluded(spark):
    """NULL keys hash to NULL and would sort FIRST on Spark but LAST
    on DuckDB (and tie arbitrarily among themselves) — the contract
    excludes them so the sample is deterministic and cross-engine."""
    from fabrix_spark.operators.sampling import fixed_size_sample

    df = spark.createDataFrame(
        [(i,) for i in range(50)] + [(None,)] * 10, "k long"
    )
    got = fixed_size_sample(df, "k", 20)
    rows = [r["k"] for r in got.collect()]
    assert len(rows) == 20 and None not in rows
    # deterministic: same pick every run
    again = [r["k"] for r in fixed_size_sample(df, "k", 20).collect()]
    assert sorted(rows) == sorted(again)


def test_knn_graph_contract(spark):
    """knn_graph: ≤ k edges per node with contiguous ranks and
    non-increasing cosine; a planted exact-duplicate pair must be each
    other's rank-1 neighbor in BOTH directions (nothing broadcasts, so
    the graph covers every node that shares a bucket)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    # plant a duplicate of vec 0 with a fresh id
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(999999).alias("vec_id"), "embedding", "label"
    )
    g = similarity.knn_graph(emb.unionByName(dup), k=3, n_planes=4, n_tables=4, dim=64)
    rows = g.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rank"], r["cosine"], r["dst"]))
    for src, es in by_src.items():
        es.sort()
        assert [e[0] for e in es] == list(range(1, len(es) + 1))
        assert len(es) <= 3
        cos = [e[1] for e in es]
        assert cos == sorted(cos, reverse=True)
    # identical vectors find each other at rank 1 with cosine 1.0
    assert by_src[0][0][1:] == (1.0, 999999)
    assert by_src[999999][0][1:] == (1.0, 0)


def test_token_index_search_and_pruning(spark, tmp_path):
    """Inverted-index search (operators/search.py): AND/OR semantics
    match a brute-force tokenize-and-scan, and the token-clustered
    lake layout actually PRUNES the posting read (manifest min/max on
    the sorted token column skips files)."""
    from fabrix_spark.operators.search import (
        build_token_index,
        search_all_terms,
        search_any_terms,
        tokens_expr,
    )
    from fabrix_spark.sources.lake import LakeTable

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_token_index(docs)
    t = LakeTable(spark, str(tmp_path / "tindex"))
    t.save(idx, "replace")
    t.optimize(cluster_by=["token"], n_files=8)

    terms = ["spark", "window"]
    kept, total = t.pruned_files([("token", "in", terms)])
    assert total == 8 and len(kept) < total  # the seek actually skips

    postings = t.scan([("token", "in", terms)]).df
    got_all = sorted(r["doc_id"] for r in search_all_terms(postings, terms).collect())
    toks = docs.select("doc_id", tokens_expr("text").alias("__t"))
    want_all = sorted(
        r["doc_id"]
        for r in toks.filter(
            F.array_contains("__t", "spark") & F.array_contains("__t", "window")
        ).collect()
    )
    assert got_all == want_all and got_all

    got_any = {
        r["doc_id"]: r["n_terms"]
        for r in search_any_terms(postings, terms).collect()
    }
    want_any = {
        r["doc_id"]: r["n"]
        for r in toks.select(
            "doc_id",
            (
                F.array_contains("__t", "spark").cast("int")
                + F.array_contains("__t", "window").cast("int")
            ).alias("n"),
        ).filter(F.col("n") > 0).collect()
    }
    assert got_any == want_any


def test_skew_report_values(spark):
    """skew_report: exact counts, deterministic tie-break on the top
    key (lexicographically larger wins), NULLs counted as ''."""
    from fabrix_spark.operators.profile import skew_report

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 6 + [("c",)] * 2 + [(None,)] * 2, "k string"
    )
    r = {x["column"]: x for x in skew_report(df, ["k"]).collect()}["k"]
    assert (r["n_total"], r["n_distinct"], r["max_cnt"]) == (16, 4, 6)
    assert r["top_key"] == "b"  # a/b tie at 6 -> larger key
    assert r["skew_ratio"] == 6 * 4 / 16


def test_negative_pairs_derangement(spark):
    """negative_pairs: a fixed-point-free permutation — every key
    appears exactly once as anchor and once as negative, never paired
    with itself; deterministic across invocations."""
    from fabrix_spark.operators.sampling import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(37)], "doc_id long")
    got = [(r["anchor_id"], r["negative_id"]) for r in negative_pairs(df, "doc_id").collect()]
    assert len(got) == 37
    anchors = sorted(a for a, _ in got)
    negs = sorted(b for _, b in got)
    assert anchors == list(range(37)) == negs
    assert all(a != b for a, b in got)
    again = [(r["anchor_id"], r["negative_id"]) for r in negative_pairs(df, "doc_id").collect()]
    assert sorted(got) == sorted(again)


def test_ewma_decayed_exact(spark):
    """ewma_decayed equals the hand-computed truncated-window decayed
    average (rational weights, renormalized over present lags)."""
    from fabrix_spark.operators.temporal import ewma_decayed

    vals = [100, 200, 400, 800]
    df = spark.createDataFrame(
        [(1, i, f"2024-01-01 00:0{i}:00", vals[i]) for i in range(4)],
        "u long, eid long, ts_s string, cents long",
    ).select("u", "eid", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "cents")
    got = {
        r["eid"]: r["ewma_cents"]
        for r in ewma_decayed(df, by="u", on="ts", value_cents="cents", tie_col="eid", window=3).collect()
    }
    # window=3, decay 9/10 -> weights (current, lag1, lag2) = (100, 90, 81)
    assert got[0] == 100.0  # only itself
    assert got[1] == (200 * 100 + 100 * 90) / 190
    assert got[2] == (400 * 100 + 200 * 90 + 100 * 81) / 271
    assert got[3] == (800 * 100 + 400 * 90 + 200 * 81) / 271


def test_knn_graph_mutual_and_scorer_parity(spark):
    """mutual=True keeps exactly the symmetric edge subset, and the
    Arrow-batched int64 dot kernel is bit-identical to the expression
    scorer (the kernel emits only integers; rounding stays JVM-side)."""
    from pyspark.sql.window import Window

    from fabrix_spark.operators.similarity import (
        _dot,
        _quantized,
        hyperplane_lsh_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    g = similarity.knn_graph(emb, k=3, n_planes=4, n_tables=4, dim=64)
    edges = {(r["src"], r["dst"]) for r in g.collect()}
    m = similarity.knn_graph(emb, k=3, n_planes=4, n_tables=4, dim=64, mutual=True)
    mutual_edges = {(r["src"], r["dst"]) for r in m.collect()}
    assert mutual_edges == {(a, b) for (a, b) in edges if (b, a) in edges}
    assert mutual_edges and mutual_edges < edges

    # expression-path twin (the pre-Arrow scorer), must match exactly
    b = hyperplane_lsh_buckets(emb, 4, "vec_id", "embedding", n_tables=4, dim=64)
    cand = (
        b.withColumnRenamed("vec_id", "src")
        .join(b.withColumnRenamed("vec_id", "dst"), ["table", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    vec = emb.select(
        F.col("vec_id").alias("__id"), _quantized(F.col("embedding"), 1_000_000).alias("__v")
    ).withColumn("__n2", _dot(F.col("__v"), F.col("__v"), True))
    s = vec.select(F.col("__id").alias("src"), F.col("__v").alias("s_v"), F.col("__n2").alias("s_n2"))
    d = vec.select(F.col("__id").alias("dst"), F.col("__v").alias("d_v"), F.col("__n2").alias("d_n2"))
    scored = cand.join(s, "src").join(d, "dst").select(
        "src", "dst",
        F.round(
            _dot(F.col("s_v"), F.col("d_v"), True)
            / F.sqrt(F.col("s_n2").cast("double") * F.col("d_n2").cast("double")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst").asc())
    want = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, want.collect()))


def test_winsorize_rank_boundaries(spark):
    """winsorize clamps at the exact k-th-smallest/largest boundaries
    (k = ceil(n·pct/100)), ignores NULLs for ranks, and passes NULLs
    through."""
    from fabrix_spark.operators.profile import winsorize

    # 100 non-null values 1..100 + nulls -> p05 boundaries: k=5 -> lo=5, hi=96
    df = spark.createDataFrame([(i,) for i in range(1, 101)] + [(None,)] * 3, "v long")
    out = winsorize(df, "v", lower_pct=5, upper_pct=5).collect()
    got = {r["v"]: (r["v_winsorized"], r["was_clipped"]) for r in out}
    assert got[1] == (5, True) and got[4] == (5, True) and got[5] == (5, False)
    assert got[100] == (96, True) and got[97] == (96, True) and got[96] == (96, False)
    assert got[50] == (50, False)
    assert got[None][0] is None  # null passes through unclamped


def test_profile_nan_and_degenerate_contracts(spark):
    """r17 self-review pins for the profiling family's NaN/degenerate
    edges: (a) histogram excludes NULL/NaN values — least(n_bins-1,
    NULL) skipped the NULL so every NULL value silently counted into
    the TOP bin — and a constant column bins everything into bin 0
    instead of dividing by a zero width; (b) winsorize's boundary
    ranks exclude NaN (NaN is greatest in Spark's total order, so a
    NaN upper tail BECAME the hi boundary and the upper clamp
    silently vanished) and NaN rows pass through unclamped;
    (c) hist_sketch / mad_outliers exclude NaN instead of dying at
    the ANSI long cast; (d) correlation drops incomplete pairs — a
    NULL row used to count in n while the sums skipped it, biasing r
    toward 0 — and survives NaN."""
    import math

    from fabrix_spark.operators.profile import (
        correlation,
        hist_sketch,
        histogram,
        mad_outliers,
        winsorize,
    )

    nulls = spark.createDataFrame([(1.0,), (2.0,), (None,), (None,)], "v double")
    assert sorted(map(tuple, histogram(nulls, "v", n_bins=4).collect())) == [
        (0, 1.0, 1.25, 1),
        (3, 1.75, 2.0, 1),
    ]
    const = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    assert sorted(map(tuple, histogram(const, "v", n_bins=4).collect())) == [
        (0, 5.0, 5.0, 2)
    ]

    nan = spark.createDataFrame(
        [(float("nan"),), (1.0,), (2.0,), (3.0,), (100.0,)], "v double"
    )
    w = {
        str(r["v"]): (str(r["v_winsorized"]), r["was_clipped"])
        for r in winsorize(nan, "v", lower_pct=30, upper_pct=30).collect()
    }
    # 4 valid values, k = ceil(4*0.3) = 2 -> lo=2, hi=3
    assert w["1.0"] == ("2.0", True) and w["100.0"] == ("3.0", True)
    assert w["nan"] == ("nan", False)  # NaN neither boundary nor clamped

    assert sorted(map(tuple, hist_sketch(nan, "v").collect())) == [(0, 3), (10, 1)]
    m = mad_outliers(nan, "v").collect()[0]
    assert m["n_rows"] == 4 and m["n_outliers"] == 1

    xy = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (float("nan"), 3.0), (None, 4.0)],
        "x double, y double",
    )
    r = correlation(xy, "x", "y").collect()[0]
    assert r["n"] == 3 and math.isclose(r["pearson_r"], 0.5)


def test_profile_per_column_aggregates_semantics_and_plan(spark):
    """r17 optimization pin for profile(): the per-column single-
    distinct rewrite (one union branch per column instead of one
    multi-distinct agg) must keep the exact semantics — NULLs counted
    in n_nulls but not n_distinct, typed min/max cast to string AFTER
    aggregation, empty input = one row per column with count 0 and
    NULL stats — and the plan must carry NO Expand node (the
    multi-distinct rewrite's signature, which dragged every min/max
    buffer through SortAggregates over an N+1-fold row blow-up)."""
    from fabrix_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")], "k int, s string"
    )
    rows = {r["column"]: r for r in profile(df, ["k", "s"]).collect()}
    k, s = rows["k"], rows["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_value"], k["max_value"]) == ("1", "2")
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_value"], s["max_value"]) == ("a", "b")

    empty = df.filter("k = 999")
    erows = {r["column"]: r for r in profile(empty, ["k", "s"]).collect()}
    assert erows["k"]["n_rows"] == 0 and erows["k"]["n_distinct"] == 0
    assert erows["k"]["n_nulls"] is None and erows["k"]["min_value"] is None

    plan = profile(df, ["k", "s"])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_derived_input_materialized_and_empty_cols_guard(spark, sf_dir):
    """r18 advisor items for profile(): (a) a DERIVED input (join/agg
    result — anything beyond a projected/filtered scan) is materialized
    once, so the per-column union branches read one consistent snapshot
    instead of re-executing the upstream subtree per column (the plan
    shows the checkpoint scan, not N aggregate subtrees); (b) a
    zero-column frame raises a clear ValueError instead of IndexError;
    (c) bare scans keep the r17 pruned-scan shape — NO checkpoint."""
    import pytest as _pytest

    from fabrix_spark.operators.profile import _is_scan_shaped, profile

    base = spark.createDataFrame([(1, "a"), (2, "b"), (2, "c")], "k int, s string")
    derived = base.groupBy("k").agg(F.count("*").alias("n"))
    assert not _is_scan_shaped(derived)
    rows = {r["column"]: r for r in profile(derived, ["k", "n"]).collect()}
    assert rows["k"]["n_rows"] == 2 and rows["n"]["n_distinct"] == 2
    plan = profile(derived, ["k", "n"])._jdf.queryExecution().optimizedPlan().toString()
    # the union branches read the materialized RDD, not N aggregates
    assert plan.count("Aggregate") <= 2 * 2 + 1  # per-column agg only
    assert "LogicalRDD" in plan

    scan = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert _is_scan_shaped(scan)
    assert _is_scan_shaped(scan.select("o_orderkey").filter("o_orderkey > 0"))
    scan_plan = (
        profile(scan, ["o_orderkey"])._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LogicalRDD" not in scan_plan  # bare scan: no checkpoint added

    with _pytest.raises(ValueError, match="zero-column"):
        profile(base.select())


def test_winsorize_sketch_path_and_ewma_guard(spark):
    """winsorize(method='sketch') with unit buckets equals the exact
    path on an integer column; ewma_decayed refuses configurations
    whose int64 headroom drops below cent magnitudes."""
    import pytest as _pytest

    from fabrix_spark.operators.profile import winsorize
    from fabrix_spark.operators.temporal import ewma_decayed

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    exact = sorted(map(tuple, winsorize(df, "v", 5, 5).collect()))
    sk = sorted(
        map(
            tuple,
            winsorize(df, "v", 5, 5, method="sketch", sketch_width=1, sketch_scale=1).collect(),
        )
    )
    assert [(a, int(b), c) for a, b, c in sk] == exact

    with _pytest.raises(ValueError, match="headroom"):
        ewma_decayed(df, by="v", on="v", value_cents="v", window=20)


def test_bm25_ranking_sanity(spark):
    """BM25: only docs containing a query term score; a document
    stuffed with a rare term outranks one with a single common term;
    rarer terms carry higher idf weight."""
    from fabrix_spark.operators.search import bm25_scores, doc_token_counts

    docs = spark.createDataFrame(
        [
            (1, "rare rare rare pad pad pad"),
            (2, "common pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad"),
        ]
        + [(10 + i, "common pad pad pad pad pad") for i in range(8)],
        "doc_id long, text string",
    )
    tf = doc_token_counts(docs)
    got = {r["doc_id"]: r["score_micro2"] for r in bm25_scores(tf, ["rare", "common"]).collect()}
    assert 3 not in got  # no query term, no row
    assert set(got) == {1, 2} | {10 + i for i in range(8)}
    assert got[1] > got[2]  # rare term + higher tf dominates
    assert all(v > 0 for v in got.values())


def test_phrase_search_consecutive_only(spark):
    """Phrase search matches CONSECUTIVE tokens only, counts multiple
    and overlapping occurrences, and longer phrases chain correctly."""
    from fabrix_spark.operators.search import positional_index, search_phrase

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick the brown fox"),          # words present, not consecutive
            (3, "quick brown x quick brown"),    # two occurrences
            (4, "quick quick quick"),            # overlapping repeats
        ],
        "doc_id long, text string",
    )
    p = positional_index(docs)
    got = {r["doc_id"]: r["n_occurrences"] for r in search_phrase(p, ["quick", "brown"]).collect()}
    assert got == {1: 1, 3: 2}
    got3 = {r["doc_id"]: r["n_occurrences"] for r in search_phrase(p, ["the", "quick", "brown"]).collect()}
    assert got3 == {1: 1}
    rep = {r["doc_id"]: r["n_occurrences"] for r in search_phrase(p, ["quick", "quick"]).collect()}
    assert rep == {4: 2}  # overlapping starts 0 and 1


def test_feature_hash_shape(spark):
    """feature_hash: buckets in [0, dim); per-doc cnt sums equal the
    doc's token count; salt changes the mapping deterministically."""
    from fabrix_spark.operators.text import feature_hash

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, ""), (3, "x x x x x")], "doc_id long, text string"
    )
    out = feature_hash(docs, dim=16).collect()
    assert all(0 <= r["feature"] < 16 for r in out)
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    assert per_doc == {1: 4, 3: 5}  # empty doc emits nothing
    a = sorted(map(tuple, feature_hash(docs, dim=16).collect()))
    b = sorted(map(tuple, feature_hash(docs, dim=16, salt="s").collect()))
    assert a == sorted(map(tuple, feature_hash(docs, dim=16).collect()))  # stable
    assert a != b  # salt perturbs


def test_token_budget_waterfill(spark):
    """Water-fill caps: small groups keep everything, big groups
    truncate to the common level; kept token total never exceeds the
    budget; an oversized budget keeps the whole corpus."""
    from fabrix_spark.operators.sampling import token_budget_sample, waterfill_caps

    rows = (
        [(f"a{i}", "small", 10) for i in range(3)]          # 30 tokens
        + [(f"b{i}", "big", 100) for i in range(50)]        # 5000 tokens
        + [(f"c{i}", "mid", 50) for i in range(10)]         # 500 tokens
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, n_chars long")

    caps = {
        r["grp"]: r["cap"]
        for r in waterfill_caps(
            df.groupBy(F.col("source").alias("grp")).agg(F.sum("n_chars").alias("tokens")),
            budget=1000,
        ).collect()
    }
    # true water level: 30 + min(500, c) + min(5000, c) = 1000 -> c = 485
    # (mid is NOT feasible whole: 530 + 1*500 = 1030 > 1000)
    assert caps == {"small": 30, "mid": 485, "big": 485}

    kept = token_budget_sample(df, "doc_id", "source", "n_chars", budget=1000)
    tot = kept.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    by_src = {r["source"]: r["t"] for r in tot}
    assert by_src["small"] == 30
    assert by_src["mid"] <= 485 and by_src["big"] <= 485  # whole docs only
    assert sum(by_src.values()) <= 1000

    # oversized budget: everything kept (level is None branch)
    assert token_budget_sample(df, "doc_id", "source", "n_chars", budget=10**9).count() == len(rows)

    # determinism
    a = sorted(r["doc_id"] for r in token_budget_sample(df, "doc_id", "source", "n_chars", 1000).collect())
    b = sorted(r["doc_id"] for r in token_budget_sample(df, "doc_id", "source", "n_chars", 1000).collect())
    assert a == b


def test_bpe_pair_counts(spark):
    """One BPE merge iteration: pair counts are word-frequency
    weighted, non-[a-z]{2,} tokens are excluded, ranking is
    (count desc, pair asc) deterministic."""
    from fabrix_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab x 42 CD cd")],
        "doc_id long, text string",
    )
    out = {r["pair"]: (r["merge_count"], r["rank"]) for r in bpe_pair_counts(docs).collect()}
    # "abab" freq 3 -> ab:2/word, ba:1/word; "cd" freq 3 (CD lowercased
    # counts too); "x" and "42" excluded by ^[a-z]{2,}$
    assert out["ab"] == (6, 1)
    assert out["ba"] == (3, 2)
    assert out["cd"] == (3, 3)
    assert len(out) == 3


def test_signed_projection_formula(spark):
    """signed_projection: components equal the hand-derived Rademacher
    sum; rp_topk ranks by exact full-width cosine among survivors and
    agrees with brute-force cosine_topk on an easy corpus."""
    from fabrix_spark.operators.similarity import cosine_topk, rp_topk, signed_projection

    df = spark.createDataFrame([(0, [1.0, -0.5, 0.25])], "vec_id long, embedding array<double>")
    out = df.select(signed_projection(F.col("embedding"), out_dim=4, quantize=100).alias("p")).head()["p"]

    def sign(i, j):
        return 1 if ((i * 2654435761 + j * 40499) % 1000003) % 2 == 0 else -1

    v = [100, -50, 25]
    expect = [sum(v[i - 1] * sign(i, j) for i in (1, 2, 3)) for j in (1, 2, 3, 4)]
    assert list(out) == expect

    # oversample >= corpus: candidates = everything, so rp_topk must
    # equal brute force exactly
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, rp_topk(emb, q, k=4, out_dim=4, oversample=30).collect()))
    b = sorted(map(tuple, cosine_topk(emb, q, k=4).collect()))
    assert a == b


def test_cluster_balanced_sample(spark):
    """cluster_balanced_sample: every vector lands in exactly one
    cluster, no cluster exceeds the cap, cluster_n reports the PRE-cap
    population, and the kept set is partitioning-independent."""
    from fabrix_spark.operators.sampling import cluster_balanced_sample

    # two obvious clusters around (1,0) and (0,1); ids 0/1 are the seeds
    rows = [(0, [1.0, 0.05]), (1, [0.05, 1.0])]
    rows += [(i, [1.0, 0.1 + i * 1e-3]) for i in range(2, 12)]     # near seed 0
    rows += [(i, [0.1 + i * 1e-3, 1.0]) for i in range(12, 17)]    # near seed 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.filter(F.col("vec_id") < 2)

    out = cluster_balanced_sample(emb, cents, cap=4).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert {len(v) for v in by_cluster.values()} == {4}          # both capped
    assert {r["cluster_n"] for r in by_cluster[0]} == {11}       # pre-cap size
    assert {r["cluster_n"] for r in by_cluster[1]} == {6}

    again = cluster_balanced_sample(emb.repartition(7), cents, cap=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# feature engineering (operators/features.py)
# ---------------------------------------------------------------------------


def test_standardize_matches_numpy(spark):
    import math

    from fabrix_spark.operators.features import standardize

    xs = [3, 7, 7, 11, 20, 1, 9]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "id long, x long")
    rows = {r["id"]: r for r in standardize(df, "x").collect()}
    n = len(xs)
    mean = sum(xs) / n
    std = math.sqrt((n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1)))
    mn, mx = min(xs), max(xs)
    for i, x in enumerate(xs):
        assert abs(rows[i]["z"] - (x - mean) / std) < 1e-12
        assert abs(rows[i]["minmax"] - (x - mn) / (mx - mn)) < 1e-12


def test_standardize_constant_column_is_null(spark):
    from fabrix_spark.operators.features import standardize

    df = spark.createDataFrame([(i, 5) for i in range(4)], "id long, x long")
    for r in standardize(df, "x").collect():
        assert r["z"] is None and r["minmax"] is None


def test_quantile_bins_equi_depth_and_tie_consistency(spark):
    from collections import Counter

    from fabrix_spark.operators.features import quantile_bins

    # 100 rows with heavy ties: equal values must always share a bin
    xs = [i // 7 for i in range(100)]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "id long, x long")
    rows = quantile_bins(df, "x", 4).collect()
    by_val = {}
    for r in rows:
        by_val.setdefault(r["x"], set()).add(r["bin"])
    assert all(len(bins) == 1 for bins in by_val.values())
    # bins are ordered with the values
    order = sorted((v, next(iter(b))) for v, b in by_val.items())
    bins_in_value_order = [b for _, b in order]
    assert bins_in_value_order == sorted(bins_in_value_order)
    # roughly equi-depth (exact up to tie spill)
    sizes = Counter(r["bin"] for r in rows)
    assert set(sizes) <= {1, 2, 3, 4} and max(sizes.values()) <= 100


def test_quantile_bins_distinct_values_are_exact_quartiles(spark):
    from collections import Counter

    from fabrix_spark.operators.features import quantile_bins

    df = spark.createDataFrame([(i, i) for i in range(100)], "id long, x long")
    sizes = Counter(r["bin"] for r in quantile_bins(df, "x", 4).collect())
    assert sizes == {1: 25, 2: 25, 3: 25, 4: 25}


def test_target_encode_loo_brute_force(spark):
    from pyspark.sql import functions as F

    from fabrix_spark.operators.features import target_encode_loo

    data = [(0, "a", 10), (1, "a", 20), (2, "a", 30), (3, "b", 7), (4, "c", 1), (5, "c", 3)]
    df = spark.createDataFrame(data, "id long, cat string, y long")
    got = {
        r["id"]: r["loo_enc"]
        for r in target_encode_loo(df, "cat", F.col("y")).collect()
    }
    assert got[0] == 25.0 and got[1] == 20.0 and got[2] == 15.0
    assert got[3] is None  # singleton category leaks nothing
    assert got[4] == 3.0 and got[5] == 1.0


# ---------------------------------------------------------------------------
# evaluation metrics (operators/metrics.py)
# ---------------------------------------------------------------------------


def _brute_auc(pairs, cls):
    pos = [s for s, c in pairs if c == cls]
    neg = [s for s, c in pairs if c != cls]
    num = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    return num / (len(pos) * len(neg))


def test_auc_one_vs_rest_matches_pairwise(spark):
    from fabrix_spark.operators.metrics import auc_one_vs_rest

    # ties across and within classes to exercise the half-count
    pairs = [
        (0.1, 0), (0.4, 0), (0.4, 1), (0.7, 1), (0.2, 2), (0.4, 2),
        (0.9, 0), (0.9, 2), (0.3, 1), (0.1, 1),
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    got = {r["cls"]: r for r in auc_one_vs_rest(df, "score", "label", [0, 1, 2]).collect()}
    for c in (0, 1, 2):
        assert abs(got[c]["auc"] - _brute_auc(pairs, c)) < 1e-12
        assert got[c]["n_pos"] + got[c]["n_neg"] == len(pairs)


def test_threshold_metrics_brute_force(spark):
    from pyspark.sql import functions as F

    from fabrix_spark.operators.metrics import threshold_metrics

    rows = [(0.2, True), (0.6, True), (0.8, False), (0.5, False), (0.9, True)]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    got = {
        r["threshold"]: r
        for r in threshold_metrics(df, "score", F.col("pos"), [0.5, 0.95]).collect()
    }
    r = got[0.5]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 2, 1, 0)
    assert r["precision"] == 0.5 and r["recall"] == 2 / 3
    r = got[0.95]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 3, 2)
    assert r["precision"] is None and r["recall"] == 0.0


def test_threshold_metrics_excludes_null_scores(spark):
    """NULL-scored rows are excluded from EVERY count (module NULL
    contract): adding unscored rows — positive and negative — leaves
    tp/fp/fn/tn and the n implied by their sum unchanged, rather than
    silently counting them as predicted-negatives in tn/fn."""
    from pyspark.sql import functions as F

    from fabrix_spark.operators.metrics import threshold_metrics

    scored = [(0.2, True), (0.6, True), (0.8, False), (0.5, False), (0.9, True)]
    with_nulls = scored + [(None, True), (None, False), (None, True)]
    want = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"])
        for r in threshold_metrics(
            spark.createDataFrame(scored, "score double, pos boolean"),
            "score", F.col("pos"), [0.5, 0.95],
        ).collect()
    }
    got = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"])
        for r in threshold_metrics(
            spark.createDataFrame(with_nulls, "score double, pos boolean"),
            "score", F.col("pos"), [0.5, 0.95],
        ).collect()
    }
    assert got == want
    assert sum(got[0.5]) == len(scored)


def test_bfs_distances_frontier_semantics(spark):
    from fabrix_spark.operators.graph import bfs_distances, to_undirected

    # path 1-2-3-4-5, triangle 10-11-12 hanging off 2, isolate 99
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (42,)], "node long")  # 42 not in graph
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(to_undirected(e), seeds, max_hops=3).collect()
    }
    # dist 0 seeds (incl. the off-graph seed), min-hop distances, cutoff at 3
    assert got == {1: 0, 42: 0, 2: 1, 3: 2, 10: 2, 4: 3, 11: 3, 12: 3}
    # directed edges: reachability follows edge direction only
    got_dir = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            e, spark.createDataFrame([(3,)], "node long"), max_hops=2
        ).collect()
    }
    assert got_dir == {3: 0, 4: 1, 5: 2}


def test_cms_sketch_upper_bound_and_mergeability(spark):
    from pyspark.sql import functions as F

    from fabrix_spark.operators.profile import cms_estimate, cms_sketch

    data = [(i % 13,) for i in range(400)] + [(7,)] * 100  # skewed key 7
    df = spark.createDataFrame(data, "k long")
    keys = spark.createDataFrame([(i,) for i in range(15)], "k long")  # 13,14 absent
    est = {
        r["k"]: r["est_cnt"]
        for r in cms_estimate(cms_sketch(df, "k", width=64, depth=4), keys, "k", 64, 4).collect()
    }
    true = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    for k in range(15):
        assert est[k] >= true.get(k, 0)  # CMS error is one-sided
    # shard sketches merge by ADDING counters == sketch of the union
    idxd = spark.createDataFrame([(i, k) for i, (k,) in enumerate(data)], "i long, k long")
    half1 = idxd.where("i < 250").select("k")
    half2 = idxd.where("i >= 250").select("k")
    s1, s2 = cms_sketch(half1, "k", 64, 4), cms_sketch(half2, "k", 64, 4)
    merged = (
        s1.unionByName(s2).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(df, "k", 64, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bm25_fused_matches_index_path(spark):
    """bm25_scores_fused (one-shuffle, no index materialization) is
    bit-identical to bm25_scores over doc_token_counts — including
    tf ties, repeated query terms, terms absent from the corpus, and
    docs with no query term (excluded in both)."""
    from fabrix_spark.operators.search import (
        bm25_scores,
        bm25_scores_fused,
        doc_token_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "rare rare rare pad pad pad"),
            (2, "common pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad"),
            (4, "rare common rare pad"),
            (5, "Common COMMON pad"),
        ]
        + [(10 + i, "common pad pad pad pad pad") for i in range(8)],
        "doc_id long, text string",
    ).repartition(3)
    terms = ["rare", "Common", "common", "ghost"]  # dup + absent term
    want = sorted(
        map(tuple, bm25_scores(doc_token_counts(docs), terms).collect())
    )
    got = sorted(map(tuple, bm25_scores_fused(docs, terms).collect()))
    assert got == want and got
    assert all(r[2] >= 1 for r in got)  # n_terms counts matched terms


def _bpe_reference(word_freqs, n_merges, min_freq=2):
    """Pure-Python Sennrich BPE: overlapping pair counts weighted by
    word freq; deterministic arg-max (count desc, left asc, right
    asc); greedy left-to-right non-overlapping merge application."""
    syms = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for it in range(n_merges):
        counts = {}
        for s, f in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        # count desc, then pair asc (the operator's deterministic tie-break)
        top = max(counts.values())
        cands = sorted(k for k, v in counts.items() if v == top)
        best = (cands[0], top)
        if top < min_freq:
            break
        (a, b), cnt = best
        merges.append((it, a, b, cnt))
        new = {}
        for s, f in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        syms = new
    return merges


def test_bpe_train_matches_python_reference(spark):
    """bpe_train == the classic Python BPE trainer on a corpus with
    ties, repeated letters (overlap semantics), words collapsing to a
    single symbol, and early stopping at min_freq."""
    from fabrix_spark.operators.text import bpe_train

    docs = [
        "low low low low low",
        "lower lower newer newer newer newer",
        "newest newest widest",
        "aaa aaab banana",
        "LOW Newer",  # uppercase words: the operator lowercases FIRST
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = [
        (r["iteration"], r["left"], r["right"], r["freq"])
        for r in bpe_train(df, n_merges=8, min_freq=2).orderBy("iteration").collect()
    ]

    # mirror the operator's pre-tokenizer exactly: LOWERCASE FIRST,
    # then the ASCII [a-z]{2,} word filter (isalpha()-then-compare
    # would drop uppercase words the operator keeps, and admit
    # non-ASCII letters the operator's regex rejects)
    import re as _re

    wf = {}
    for t in docs:
        for w in t.lower().split():
            if _re.fullmatch("[a-z]{2,}", w):
                wf[w] = wf.get(w, 0) + 1
    want = _bpe_reference(wf, 8, min_freq=2)
    assert got == want and len(got) >= 5


def test_bpe_apply_merge_greedy_nonoverlap(spark):
    """The fold merge is greedy left-to-right and non-overlapping:
    (a,a) over aaaa -> [aa, aa]; over aaa -> [aa, a]; a merged token
    never re-merges as the left half within the same pass."""
    from pyspark.sql import functions as F

    from fabrix_spark.operators.text import bpe_apply_merge

    df = spark.createDataFrame(
        [(1, list("aaaa")), (2, list("aaa")), (3, list("ab")), (4, ["x"])],
        "id long, symbols array<string>",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", bpe_apply_merge(F.col("symbols"), "a", "a").alias("m")).collect()
    }
    assert got == {1: ["aa", "aa"], 2: ["aa", "a"], 3: ["a", "b"], 4: ["x"]}


def test_audio_fingerprint_sql_twin_duckdb(spark):
    """The WAV energy-delta fingerprint is SQL-expressible byte for
    byte (the r12 oracle recipe, mirroring m_image_neardup's aHash
    twin): hex-decode int16 LE samples past the 44-byte canonical PCM
    header, window them with numpy's array_split boundaries (first
    l%f windows take one extra sample), integer energies, one bit per
    adjacent-window energy increase. Exactness: energies are integer
    sums < 2^53, so numpy's float64 accumulation and BIGINT agree."""
    import duckdb

    from fabrix_spark.operators.multimodal import audio_fingerprints

    # 2050 samples exercises the ragged split (q=32, r=2); 2048 the even one
    clips = [
        (1, _mk_wav([220, 440, 330, 550], n=2048, rate=8000)),
        (2, _mk_wav([550, 262, 494, 220], n=2050, rate=8000)),
        (3, _mk_wav([392, 494], n=2048, rate=8000, amp=9000, noise=80)),
    ]
    for _id, blob in clips:
        assert len(blob) % 2 == 0 and blob[:4] == b"RIFF"

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in clips], "doc_id long, content binary"
    )
    got = {r["id"]: r["afp"] for r in audio_fingerprints(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE clips(id BIGINT, hx VARCHAR, nb BIGINT)")
    for i, b in clips:
        con.execute("INSERT INTO clips VALUES (?, ?, ?)", [i, b.hex(), len(b)])
    twin = con.execute("""
WITH par AS (
  SELECT id, hx, (nb - 44) // 2 AS l, ((nb - 44) // 2) // 64 AS q,
         ((nb - 44) // 2) % 64 AS r
  FROM clips
),
samples AS (
  SELECT id, i,
         CAST(concat('0x', substr(hx, 2 * (44 + 2 * i + 1) + 1, 2),
                            substr(hx, 2 * (44 + 2 * i) + 1, 2)) AS BIGINT) AS u,
         CASE WHEN i < r * (q + 1) THEN i // (q + 1)
              ELSE r + (i - r * (q + 1)) // q END AS blk
  FROM par CROSS JOIN generate_series(0, 2100) AS t(i)
  WHERE i < l
),
energies AS (
  SELECT id, blk,
         sum((CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
             * (CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)) AS e
  FROM samples GROUP BY 1, 2
),
bits AS (
  SELECT id, blk - 1 AS k,
         CASE WHEN e > lag(e) OVER (PARTITION BY id ORDER BY blk)
              THEN 1 ELSE 0 END AS b
  FROM energies
)
SELECT id, CAST(sum(CASE WHEN b = 1 THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS afp
FROM bits WHERE k >= 0 GROUP BY id
""").fetchall()
    assert {i: v for i, v in twin} == got and len(got) == 3


def test_synthesize_wav_header_matches_wave_module(spark):
    """The struct-packed canonical header (r17 fast path) is
    byte-identical to what the wave module wrote: RIFF size, fmt
    chunk, data size — for empty, odd-length (truncated to even) and
    ordinary payloads. Pin so a future header edit cannot silently
    diverge from the `wave`-parsable canonical form the fingerprint
    side (and the hex-SQL oracles) depend on."""
    import io
    import wave as wave_mod

    from fabrix_spark.operators.multimodal import synthesize_wav

    payloads = [(1, b""), (2, b"\x01"), (3, bytes(range(256)) * 3), (4, b"ab" * 139)]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: bytes(r["content"]) for r in synthesize_wav(df, rate=8000).collect()}
    for i, p in payloads:
        raw = p[: len(p) // 2 * 2]
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(raw)
        assert got[i] == buf.getvalue(), f"doc {i} header diverged"
        with wave_mod.open(io.BytesIO(got[i])) as w:
            assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)


def test_audio_fingerprint_kernel_matches_per_chunk_reference():
    """The cumsum-windowed fingerprint kernel (r17 vectorization) is
    bit-identical to the straightforward per-chunk reference (the
    pre-r17 implementation: float64 per-chunk energy sums + a Python
    bit loop) across ragged/even splits, tie-heavy energies, and the
    frame-count extremes the operator accepts."""
    import io
    import wave as wave_mod

    import numpy as np

    from fabrix_spark.operators.multimodal import audio_fingerprint_wav

    def reference(blob: bytes, frames: int) -> int:
        with wave_mod.open(io.BytesIO(blob)) as w:
            raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
        energies = np.asarray(
            [float((c * c).sum()) for c in np.array_split(samples, frames)]
        )
        bits = (np.diff(energies) > 0).astype(np.uint64)
        h = 0
        for i, b in enumerate(bits):
            h |= int(b) << i
        return h - (1 << 64) if h >= (1 << 63) else h

    rng = np.random.default_rng(11)
    for trial in range(120):
        n = int(rng.integers(64, 1500))
        # small amplitude range makes equal-energy ties (the > vs >=
        # boundary) actually occur
        pcm = rng.integers(-4, 4, size=n, dtype=np.int16)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        blob = buf.getvalue()
        for frames in (2, 33, 64, 65):
            assert audio_fingerprint_wav(blob, frames) == reference(blob, frames)


def _bpe_twin_sql(n_merges: int, min_freq: int = 2) -> str:
    """Unrolled DuckDB twin of bpe_train (the r12 oracle recipe):
    per iteration, one pair-count + deterministic arg-max CTE and one
    window-based greedy merge application — merged positions are the
    even-parity members of each run of consecutive matches (runs only
    arise for self-pairs), and the row after a merged position is
    consumed. Emits (iteration, left, right, freq). Every
    per-iteration CTE is AS MATERIALIZED: DuckDB inlines CTEs by
    default, re-evaluating the whole cur-chain once per reference —
    exponential in n_merges (measured: 0.3 s at 3 iters, 9 s at 4);
    materialized it is linear (0.12 s at 6)."""
    sql = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents
),
wf AS (
  SELECT word, count(*) AS freq FROM toks
  WHERE regexp_full_match(word, '[a-z]{2,}') GROUP BY 1
),
cur0 AS MATERIALIZED (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INTEGER), 1)) AS sym
  FROM wf
)"""
    for k in range(n_merges):
        sql += f""",
pc{k} AS MATERIALIZED (
  SELECT sym[CAST(i AS INTEGER)] AS l, sym[CAST(i AS INTEGER) + 1] AS r,
         sum(freq) AS cnt
  FROM cur{k} CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE i <= len(sym) - 1
  GROUP BY 1, 2
),
best{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM pc{k}
  WHERE cnt >= {min_freq}
  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
pos{k} AS MATERIALIZED (
  SELECT word, freq, CAST(i AS INTEGER) AS p, sym[CAST(i AS INTEGER)] AS s,
         (sym[CAST(i AS INTEGER)] = (SELECT l FROM best{k})
          AND sym[CAST(i AS INTEGER) + 1] IS NOT DISTINCT FROM (SELECT r FROM best{k})) AS m
  FROM cur{k} CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE i <= len(sym) AND EXISTS (SELECT 1 FROM best{k})
),
runs{k} AS (
  SELECT *, p - row_number() OVER (PARTITION BY word, m ORDER BY p) AS grp
  FROM pos{k}
),
mk{k} AS (
  SELECT *, m AND (p - min(p) OVER (PARTITION BY word, m, grp)) % 2 = 0 AS merged
  FROM runs{k}
),
keep{k} AS MATERIALIZED (
  SELECT word, freq, p,
         CASE WHEN merged
              THEN (SELECT l FROM best{k}) || (SELECT r FROM best{k})
              ELSE s END AS s2,
         coalesce(lag(merged) OVER (PARTITION BY word ORDER BY p), false) AS consumed
  FROM mk{k}
),
cur{k + 1} AS MATERIALIZED (
  SELECT word, freq, list(s2 ORDER BY p) AS sym
  FROM keep{k} WHERE NOT consumed GROUP BY word, freq
  UNION ALL
  SELECT word, freq, sym FROM cur{k}
  WHERE NOT EXISTS (SELECT 1 FROM best{k})
)"""
    selects = " UNION ALL ".join(
        f"SELECT {k} AS iteration, l AS left, r AS right, CAST(cnt AS BIGINT) AS freq FROM best{k}"
        for k in range(n_merges)
    )
    return sql + f"\n{selects}\nORDER BY iteration"


def test_bpe_train_duckdb_twin(spark):
    """bpe_train == the unrolled DuckDB SQL twin (the r12 oracle
    recipe) on a corpus with ties, self-pair runs, and words that
    fully collapse — proving the merge table is SQL-oracleable."""
    import duckdb

    from fabrix_spark.operators.text import bpe_train

    docs = [
        "low low low low low",
        "lower lower newer newer newer newer",
        "newest newest widest",
        "aaaa aaaa banana banana",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = [
        (r["iteration"], r["left"], r["right"], r["freq"])
        for r in bpe_train(df, n_merges=6, min_freq=2).orderBy("iteration").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(docs):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    want = [tuple(r) for r in con.execute(_bpe_twin_sql(6)).fetchall()]
    assert got == [(it, l, r, f) for it, l, r, f in want] and len(got) == 6


def test_calibration_bins_duckdb_twin(spark):
    """calibration_bins == the DuckDB twin (the r12 oracle recipe) on
    scores hitting every edge: exact bin boundaries (0.0, 0.5, 1.0),
    out-of-range clamps (-0.1, 1.3), a singleton bin, mixed labels,
    and a NULL score — which must be EXCLUDED, not silently clamped
    into the top bin (least/greatest skip NULL arguments).
    Quantized-integer mean sums make the match exact."""
    import duckdb

    from fabrix_spark.operators.metrics import calibration_bins

    rows = [
        (0.0, False), (0.05, False), (0.12, True), (0.5, True),
        (0.55, False), (0.9999, True), (1.0, True), (-0.1, False),
        (1.3, True), (0.123456, False), (0.51, True), (None, True),
    ]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    got = sorted(
        map(tuple, calibration_bins(df, "score", F.col("pos"), n_bins=10).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE scored(score DOUBLE, pos BOOLEAN)")
    for s, p in rows:
        con.execute("INSERT INTO scored VALUES (?, ?)", [s, p])
    want = sorted(
        tuple(r)
        for r in con.execute("""
WITH binned AS (
  SELECT greatest(0, least(CAST(floor(score * 10) AS INTEGER), 9)) AS bin,
         score, pos
  FROM scored WHERE score IS NOT NULL
),
agg AS (
  SELECT bin, count(*) AS n,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         sum(CAST(round(score * 1000000) AS DECIMAL(38,0))) AS sq
  FROM binned GROUP BY 1
)
SELECT bin, CAST(bin AS DOUBLE) / 10 AS bin_lo,
       CAST(bin + 1 AS DOUBLE) / 10 AS bin_hi,
       CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_score,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
FROM agg
""").fetchall()
    )
    # bins 0 (0.0, 0.05, clamped -0.1), 1, 5, 9 (0.9999, 1.0, clamped 1.3)
    assert got == want and len(got) == 4
    by_bin = {r[0]: r for r in got}
    assert by_bin[0][3] == 3 and by_bin[9][3] == 3  # clamps kept the rows


def test_roc_points_duckdb_twin(spark):
    """roc_points == the DuckDB window-sum twin (the r12 oracle
    recipe) on tied scores; also pins the curve contract: tp/fp are
    non-increasing in score and hit (P, N) at the minimum score."""
    import duckdb

    from fabrix_spark.operators.metrics import roc_points

    rows = [
        (0.1, False), (0.4, False), (0.4, True), (0.7, True), (0.2, False),
        (0.4, False), (0.9, True), (0.9, False), (0.3, True), (0.1, True),
        (None, True),  # unscored row: EXCLUDED from the ranking metric
    ]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = roc_points(df, "score", F.col("pos")).orderBy("score").collect()
    got = [tuple(r) for r in out]
    con = duckdb.connect()
    con.execute("CREATE TABLE scored(score DOUBLE, pos BOOLEAN)")
    for s, p in rows:
        con.execute("INSERT INTO scored VALUES (?, ?)", [s, p])
    want = [
        tuple(r)
        for r in con.execute("""
WITH sc AS (SELECT score, pos FROM scored WHERE score IS NOT NULL),
g AS (
  SELECT score, count(*) AS tot,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pos
  FROM sc GROUP BY 1
),
cum AS (
  SELECT score, tot, pos,
         sum(tot) OVER (ORDER BY score) AS cum_tot,
         sum(pos) OVER (ORDER BY score) AS cum_pos,
         (SELECT count(*) FROM sc) AS n_all,
         (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) FROM sc) AS p_all
  FROM g
)
SELECT score,
       CAST(p_all - (cum_pos - pos) AS BIGINT) AS tp,
       CAST((n_all - p_all) - ((cum_tot - tot) - (cum_pos - pos)) AS BIGINT) AS fp,
       CASE WHEN p_all > 0 THEN CAST(p_all - (cum_pos - pos) AS DOUBLE) / CAST(p_all AS DOUBLE) END AS tpr,
       CASE WHEN n_all - p_all > 0 THEN CAST((n_all - p_all) - ((cum_tot - tot) - (cum_pos - pos)) AS DOUBLE) / CAST(n_all - p_all AS DOUBLE) END AS fpr
FROM cum ORDER BY score
""").fetchall()
    ]
    assert got == want and len(got) == 6
    # curve contract: descending thresholds sweep tp 0→P, fp 0→N
    tps = [r["tp"] for r in out]
    fps = [r["fp"] for r in out]
    assert tps == sorted(tps, reverse=True) and fps == sorted(fps, reverse=True)
    assert tps[0] == 5 and fps[0] == 5  # at min score everything is positive


def test_resample_interpolate_duckdb_twin(spark):
    """resample_interpolate == a DuckDB LATERAL-join twin (the r12
    oracle recipe) over irregular per-key series: NULL before first /
    after last observation, exact passthrough at coincident grid
    instants (no float ops), linear interpolation elsewhere, and
    max-collapse of duplicate (key, ts) observations."""
    import datetime as dt

    import duckdb

    from fabrix_spark.operators.temporal import resample_interpolate

    t = lambda h, m=0: dt.datetime(2024, 3, 1, h, m)  # noqa: E731
    rows = [
        ("a", t(1, 30), 10.0),
        ("a", t(4, 0), 40.0),   # exactly on the grid
        ("a", t(6, 45), 13.0),
        ("b", t(2, 0), 5.0),
        ("b", t(2, 0), 7.0),    # duplicate instant -> max collapses to 7
        ("b", t(2, 20), 1.0),
        ("c", t(9, 10), 3.0),   # single observation: grid has no interpolable point
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = sorted(
        (r["user_id"], r["grid_ts"], r["value"])
        for r in resample_interpolate(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE raw(user_id VARCHAR, ts TIMESTAMP, value DOUBLE)")
    for k, ts, v in rows:
        con.execute("INSERT INTO raw VALUES (?, ?, ?)", [k, ts, v])
    want = sorted(
        tuple(r)
        for r in con.execute("""
WITH obs AS (
  SELECT user_id, ts, max(value) AS v FROM raw GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0,
         date_trunc('hour', max(ts)) AS t1
  FROM raw GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS g
  FROM bounds
)
SELECT grid.user_id, grid.g AS grid_ts,
       CASE WHEN p.ts IS NULL THEN NULL
            WHEN p.ts = grid.g THEN p.v
            WHEN n.ts IS NULL THEN NULL
            ELSE p.v + (n.v - p.v)
                 * (CAST(epoch_us(grid.g) - epoch_us(p.ts) AS DOUBLE)
                    / CAST(epoch_us(n.ts) - epoch_us(p.ts) AS DOUBLE))
       END AS value
FROM grid
LEFT JOIN LATERAL (
  SELECT ts, v FROM obs o
  WHERE o.user_id = grid.user_id AND o.ts <= grid.g
  ORDER BY ts DESC LIMIT 1
) p ON true
LEFT JOIN LATERAL (
  SELECT ts, v FROM obs o
  WHERE o.user_id = grid.user_id AND o.ts > grid.g
  ORDER BY ts ASC LIMIT 1
) n ON true
""").fetchall()
    )
    assert got == want
    by_key = {(k, ts): v for k, ts, v in got}
    # a: grid 01..06; 01 precedes the first obs -> NULL; 04 is exact
    assert by_key[("a", t(1))] is None and by_key[("a", t(4))] == 40.0
    # 02:00 sits 30min into the 150min span 01:30 -> 04:00
    assert abs(by_key[("a", t(2))] - (10 + 30 * (40 - 10) / 150)) < 1e-12
    # b: duplicate-instant max wins at 02:00 (grid-coincident)
    assert by_key[("b", t(2))] == 7.0
    # c: the lone grid instant 09:00 precedes the only obs -> NULL
    assert by_key[("c", t(9))] is None


def test_pr_points_and_average_precision_duckdb_twin(spark):
    """pr_points and average_precision == their DuckDB twins (split
    integer division — Spark DIV/% on decimals are exact where the
    plain decimal quotient falls to scale 6), and AP == the sklearn
    step-sum computed brute-force in Python."""
    import duckdb

    from fabrix_spark.operators.metrics import average_precision, pr_points

    rows = [
        (0.1, False), (0.4, False), (0.4, True), (0.7, True), (0.2, False),
        (0.4, False), (0.9, True), (0.9, False), (0.3, True), (0.1, True),
        (None, False),  # unscored row: excluded from both metrics
    ]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    got_pr = [tuple(r) for r in pr_points(df, "score", F.col("pos")).orderBy("score").collect()]
    got_ap = average_precision(df, "score", F.col("pos")).collect()[0]
    rows = [r for r in rows if r[0] is not None]

    con = duckdb.connect()
    con.execute("CREATE TABLE scored(score DOUBLE, pos BOOLEAN)")
    for s, p in rows:
        con.execute("INSERT INTO scored VALUES (?, ?)", [s, p])
    base = """
WITH g AS (
  SELECT score, count(*) AS tot,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pos
  FROM scored GROUP BY 1
),
cum AS (
  SELECT score, tot, pos,
         sum(tot) OVER (ORDER BY score) AS cum_tot,
         sum(pos) OVER (ORDER BY score) AS cum_pos,
         (SELECT count(*) FROM scored) AS n_all,
         (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) FROM scored) AS p_all
  FROM g
),
pts AS (
  SELECT score, pos,
         p_all - (cum_pos - pos) AS tp,
         (n_all - p_all) - ((cum_tot - tot) - (cum_pos - pos)) AS fp,
         n_all, p_all
  FROM cum
)
"""
    want_pr = [
        tuple(r)
        for r in con.execute(base + """
SELECT score, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
       CASE WHEN p_all > 0 THEN CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE) END AS recall
FROM pts ORDER BY score
""").fetchall()
    ]
    assert got_pr == want_pr and len(got_pr) == 6

    want_ap = con.execute(base + """
, terms AS (
  SELECT p_all, n_all,
         (CAST(pos AS HUGEINT) * tp) // (tp + fp) * 1000000000000
         + ((CAST(pos AS HUGEINT) * tp) % (tp + fp)) * 1000000000000 // (tp + fp)
         AS term
  FROM pts
)
SELECT CAST(n_all AS BIGINT) AS n, CAST(p_all AS BIGINT) AS n_pos,
       CAST(sum(term) AS DOUBLE) / (CAST(p_all AS DOUBLE) * 1000000000000.0) AS ap
FROM terms GROUP BY n_all, p_all
""").fetchall()[0]
    assert (got_ap["n"], got_ap["n_pos"], got_ap["ap"]) == want_ap

    # sklearn step-sum brute force: AP = sum over descending distinct
    # thresholds of (R_k - R_{k-1}) * P_k
    P = sum(1 for _, p in rows if p)
    pts = sorted(
        {s for s, _ in rows},
        reverse=True,
    )
    ap, prev_r = 0.0, 0.0
    for t in pts:
        tp = sum(1 for s, p in rows if p and s >= t)
        fp = sum(1 for s, p in rows if not p and s >= t)
        r, pr = tp / P, tp / (tp + fp)
        ap += (r - prev_r) * pr
        prev_r = r
    assert abs(got_ap["ap"] - ap) < 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),           # key
            st.integers(min_value=0, max_value=10_800),      # seconds offset (3h)
            st.integers(min_value=-1000, max_value=1000),    # value (int → exact)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_resample_interpolate_matches_python_model(spark, rows):
    """Differential check of the linear gap-fill against a direct
    python model over random irregular multi-key series: NULL outside
    the observation span, exact passthrough on coincident instants,
    the same IEEE expression shape for interpolated points."""
    import datetime as dt

    from fabrix_spark.operators.temporal import resample_interpolate

    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(seconds=s), float(v)) for k, s, v in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["grid_ts"]): r["value"]
        for r in resample_interpolate(df).collect()
    }

    want = {}
    bykey = {}
    for k, ts, v in data:
        bykey.setdefault(k, []).append((ts, v))
    for k, obs in bykey.items():
        obs.sort()
        t0 = obs[0][0].replace(minute=0, second=0, microsecond=0)
        t1 = obs[-1][0].replace(minute=0, second=0, microsecond=0)
        g = t0
        while g <= t1:
            prev = next_ = None
            for ts, v in obs:
                if ts <= g:
                    prev = (ts, v)
                elif next_ is None:
                    next_ = (ts, v)
            if prev is None or (prev[0] != g and next_ is None):
                want[(k, g)] = None
            elif prev[0] == g:
                want[(k, g)] = prev[1]
            else:
                dt_num = (g - prev[0]) / dt.timedelta(microseconds=1)
                dt_den = (next_[0] - prev[0]) / dt.timedelta(microseconds=1)
                want[(k, g)] = prev[1] + (next_[1] - prev[1]) * (dt_num / dt_den)
            g += dt.timedelta(hours=1)
    assert got == want


def _py_bpe_apply(word: str, merges) -> list[str]:
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_and_roundtrips(spark):
    """bpe_encode == a python greedy-merge reference on every token,
    positions are deterministic, and concatenating each word's symbols
    reconstructs the word (no token lost or duplicated by the
    vocab-join shape). Uses merges from bpe_train so the train→encode
    pair is exercised end to end, plus a self-pair merge run."""
    from fabrix_spark.operators.text import bpe_encode, bpe_train

    docs = [
        (0, "low low lower newest"),
        (1, "aaaa banana newest widest"),
        (2, "Skip1 !? a xx"),  # non-[a-z]{2,} words drop; 'xx' stays
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(df, n_merges=5, min_freq=2).orderBy("iteration").collect()
    ]
    assert merges, "trainer found no merges"
    got = bpe_encode(df, merges, checkpoint_every=2).collect()

    want = []
    for doc_id, txt in docs:
        for word_pos, word in enumerate(txt.lower().strip().split()):
            import re

            if not re.fullmatch("[a-z]{2,}", word):
                continue
            for sym_pos, tok in enumerate(_py_bpe_apply(word, merges)):
                want.append((doc_id, word_pos, sym_pos, tok))
    assert sorted(map(tuple, got)) == sorted(want)

    # reconstruction invariant: symbols of each (doc, word_pos) concat
    # back to the original word
    by_word = {}
    for doc_id, word_pos, sym_pos, tok in map(tuple, got):
        by_word.setdefault((doc_id, word_pos), []).append((sym_pos, tok))
    for (doc_id, word_pos), toks in by_word.items():
        rebuilt = "".join(t for _, t in sorted(toks))
        assert rebuilt == docs[doc_id][1].lower().strip().split()[word_pos]


def test_bpe_encode_plan_shape(spark):
    """The merge loop must never touch the corpus: the corpus appears
    exactly once in the encode plan, met by a broadcast hash join on
    word (no shuffle of corpus rows, no cartesian)."""
    from fabrix_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(0, "low lower newest")], "doc_id long, text string"
    )
    plan = (
        bpe_encode(df, [("l", "o"), ("lo", "w")], checkpoint_every=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # corpus scan appears once: one ExistingRDD/LocalTableScan per side,
    # the vocab side derives from its own scan — no corpus re-shuffle
    assert plan.count("Exchange hashpartitioning") == 0 or "doc_id" not in str(
        [l for l in plan.splitlines() if "hashpartitioning" in l]
    )


@pytest.mark.slow
def test_staged_queries_oracle_parity(spark, sf_dir):
    """Every STAGED query (the r12 promotion candidates in queries.py)
    passes the EXACT verify_local compare against its DuckDB oracle at
    sf0.001 — same column-name, type-family, and canonical-value
    semantics the driver gate uses — so promotion to the live registry
    is a decorator swap, not new verification work."""
    import importlib.util
    import pathlib

    import duckdb

    from fabrix_spark.queries import STAGED

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        str(pathlib.Path(__file__).resolve().parent.parent / "tools" / "verify_local.py"),
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)

    con = duckdb.connect()
    for t in vl.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    assert STAGED, "no staged queries found"
    for name, qd in STAGED.items():
        s_tbl = qd.fn(spark, sf_dir).toArrow()
        assert qd.oracle is not None, f"{name} has no oracle"
        o_tbl = con.execute(qd.oracle).arrow()
        err = vl.compare(s_tbl, o_tbl)
        assert err is None, f"{name}: {err}"
        assert s_tbl.num_rows > 0, f"{name}: empty result"


def test_fuzzy_update_replay_mutation_sensitivity(spark, tmp_path):
    """stream_fuzzy_update_replay's oracle is SENSITIVE to each of the
    three update semantics it exists to pin (the r15 verdict's staged
    unit): on a constructed corpus where every path fires, the Spark
    operator matches the true oracle exactly, and disabling any ONE
    semantic in the oracle builder (outgoing exclusion / tombstone /
    the delivery-invariant count basis) changes the admitted set — in
    a distinct row each, so a regression in any path cannot hide.
    The real documents corpus exercises the tombstone path densely
    (63 tombstones at sf0.01, covered by the 3-SF staged parity) but
    leaves the other two mutations invisible there, which is exactly
    what this fixture closes."""
    import collections

    import duckdb

    from fabrix_spark.queries import STAGED, _fuzzy_update_oracle

    AA = "OUTGOING-SCENARIO "  # 16+ chars shared by TA and Q
    TA = AA + "original content of doc eight with plenty of distinctive words"
    TB = "REPLACEMENT-TARGET content that doc eight now duplicates in second version"
    q_text = TA[:-10] + "Q-TAIL-ED!"  # near TA (prefix block), tail edit

    PRE = "CAP-BLOCK-SHARED opening segment "
    tx2 = PRE + "x-two body with its own long unique tail of words here"
    members = [(202, tx2)]
    i = 204
    while len(members) < 64:  # 202 + 63 others
        if i % 8 != 0:
            members.append((i, PRE + f"member {i} " + f"filler-{i} " * 4))
        i += 2
    x_text = tx2 + " v2"  # doc 200's CURRENT text == its incoming update
    p_text = members[1][1][:-12] + "P-TAIL-EDIT!"  # near member, tail edit

    rows = (
        [(8, TA, "aa"), (10, TB, "aa"), (3, q_text, "aa")]
        + [(200, x_text, "bb"), (301, p_text, "bb")]
        + [(i, t, "bb") for i, t in members]
    )
    fixture = str(tmp_path / "fx")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").coalesce(
        1
    ).write.parquet(fixture + "/documents.parquet")

    # 'bb' prefix block: 65 rows in b0 (63 members + 202 + 200), the
    # count basis excludes batch ids (200) -> 64 = cap -> kept; the
    # probe ref keeps all 65 (200's update is verbatim, not outgoing)
    got = collections.Counter(
        map(tuple, STAGED["stream_fuzzy_update_replay"].fn(spark, fixture).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{fixture}/documents.parquet/*.parquet'"
    )
    true = collections.Counter(con.execute(_fuzzy_update_oracle()).fetchall())
    assert got == true

    # the decisions the fixture is built to force: Q admitted (its
    # rejector is outgoing), 8 tombstoned, P rejected (block at cap)
    ids = {d for d, _ in true}
    assert 3 in ids and 8 not in ids and 301 not in ids

    muts = {
        "no_outgoing": _fuzzy_update_oracle(outgoing_exclusion=False),
        "no_tombstone": _fuzzy_update_oracle(tombstone=False),
        "count_over_ref": _fuzzy_update_oracle(count_basis="ref"),
    }
    flipped = {}
    for name, sql in muts.items():
        mut = collections.Counter(con.execute(sql).fetchall())
        assert mut != true, f"{name}: mutated oracle did not change the admitted set"
        flipped[name] = {d for d, _ in (mut - true) | (true - mut)}
    assert flipped["no_outgoing"] == {3}  # Q rejected by the outgoing row
    assert flipped["no_tombstone"] == {8}  # stale row retained
    assert flipped["count_over_ref"] == {301}  # block purged, P admitted


def test_dsir_weights_matches_python_reference(spark):
    """dsir_weights == a pure-Python replay of the DSIR formula
    (hashed-bucket distributions, add-one smoothing, micro-nat
    quantized log-ratios) on a corpus whose TARGET IS NOT A SUBSET —
    exercising the full-outer bucket join (target-only buckets must
    smooth correctly, not drop)."""
    import hashlib
    import math
    from collections import Counter

    from fabrix_spark.operators.similarity import _round_half_up
    from fabrix_spark.operators.text import dsir_weights

    dim = 32
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices rose sharply"),
        (3, "cat videos and cat memes"),
        (4, "der markt ist offen"),
    ]
    target = [
        (101, "cat pictures of a cat and a kitten"),
        (102, "the kitten sat"),
    ]

    def buckets(text):
        toks = [t for t in text.lower().strip().split() if t]
        return Counter(
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim for t in toks
        )

    src = Counter()
    for _, t in corpus:
        src.update(buckets(t))
    tgt = Counter()
    for _, t in target:
        tgt.update(buckets(t))
    ns, nt = sum(src.values()), sum(tgt.values())
    lr = {
        f: _round_half_up(
            (
                math.log((tgt.get(f, 0) + 1) / (nt + dim))
                - math.log((src.get(f, 0) + 1) / (ns + dim))
            )
            * 1_000_000
        )
        for f in set(src) | set(tgt)
    }
    want = {}
    for i, t in corpus:
        b = buckets(t)
        n = sum(b.values())
        want[i] = (n, sum(c * lr[f] for f, c in b.items()))

    df = spark.createDataFrame(corpus, "doc_id int, text string")
    tdf = spark.createDataFrame(target, "doc_id int, text string")
    got = {
        r["doc_id"]: r for r in dsir_weights(df, tdf, dim=dim).collect()
    }
    assert set(got) == set(want)
    for i, (n, logw) in want.items():
        assert (got[i]["n_tokens"], got[i]["logw_micro"]) == (n, logw), i
        assert abs(got[i]["logw_per_token"] - logw / (1e6 * n)) < 1e-15


def test_gram_matrix_exact_and_null_safe(spark):
    """gram_matrix == numpy QᵀQ on the JVM-quantized integers; NULL
    embedding rows are excluded (they carry no energy, and a NULL
    array would poison the batch matmul)."""
    import numpy as np

    from fabrix_spark.operators.similarity import gram_matrix

    vecs = [
        [0.5, -0.25, 1.0],
        [0.125, 0.0, -0.5],
        [-1.0, 0.25, 0.125],
        [0.0, 1.0, 0.0],
    ]
    df = spark.createDataFrame(
        [(v,) for v in vecs] + [(None,)], "embedding array<float>"
    )
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_matrix(df, quantize=1000).collect()
    }
    q = np.array([[round(x * 1000) for x in v] for v in vecs], dtype=np.int64)
    want = q.T @ q
    assert got == {
        (i, j): int(want[i, j]) for i in range(3) for j in range(3)
    }


def test_gram_matrix_overflow_guard_chunks_and_raises(spark):
    """The r12 verdict's one silent-failure risk, closed: a batch
    whose rows·max|q|² exceeds int64 is CHUNKED into exact partials
    (unguarded numpy int64 matmul WRAPS silently — 1000 rows at
    |q| = 1e8 put g₀₀ at 1e19 > 2⁶³), a single row with
    max|q|² ≥ 2⁶³ raises a clear error instead of corrupting G, and
    a ragged embedding column raises instead of an object-dtype
    crash."""
    import pytest

    from fabrix_spark.operators.similarity import gram_matrix

    n = 1000
    df = spark.createDataFrame(
        [([100.0, -50.0],) for _ in range(n)], "embedding array<float>"
    ).coalesce(1)
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_matrix(df, quantize=1_000_000).collect()
    }
    q0, q1 = 100 * 1_000_000, -50 * 1_000_000
    want = {
        (0, 0): n * q0 * q0,
        (0, 1): n * q0 * q1,
        (1, 0): n * q0 * q1,
        (1, 1): n * q1 * q1,
    }
    assert want[(0, 0)] > (1 << 63) - 1  # the partial that used to wrap
    assert got == want  # exact Python-int reference — a wrap would differ

    big = spark.createDataFrame([([4000.0],)], "embedding array<float>")
    with pytest.raises(Exception, match="single-row"):
        gram_matrix(big, quantize=1_000_000).collect()

    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0],)], "embedding array<float>"
    ).coalesce(1)
    with pytest.raises(Exception, match="ragged"):
        gram_matrix(ragged, quantize=1000).collect()


def test_collect_gram_derives_dim(spark):
    """collect_gram derives dim from the matrix itself (max index + 1)
    — the PCA/drift wrappers run unchanged on a non-64-dim corpus (r12
    verdict #3), sentinels and all."""
    from fabrix_spark.operators.similarity import (
        collect_gram,
        gram_matrix,
        power_iteration_top,
    )

    vecs = [[0.5, -0.25, 1.0, 0.125, 0.0], [0.125, 0.0, -0.5, 1.0, 0.25]]
    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    rows, sums, n, dim = collect_gram(
        gram_matrix(df, quantize=1000, with_sums=True)
    )
    assert dim == 5 and n == 2 and len(rows) == 25
    assert sums == [
        round(a * 1000) + round(b * 1000) for a, b in zip(*vecs)
    ]
    v = power_iteration_top(rows, dim=dim, iters=3, sums=sums, n=n)
    assert len(v) == 5


def test_auc_by_group_via_validated(spark):
    """A typo'd ``via`` raises instead of silently handing a
    wide-segment workload the single-reducer window plan (r12
    ADVICE)."""
    import pytest

    from fabrix_spark.operators.metrics import auc_by_group

    df = spark.createDataFrame(
        [("a", 0.5, True)], "seg string, score double, pos boolean"
    )
    with pytest.raises(ValueError, match="global_cumsum"):
        auc_by_group(df, "score", F.col("pos"), ["seg"], via="global-cumsum")


def test_ks_statistic_matches_bruteforce(spark):
    """ks_statistic == the O(n·m) brute-force empirical-CDF supremum
    on random integer-valued cohorts — ties within and across cohorts,
    disjoint supports, and NULL exclusion all covered. The exact
    cross-multiplied numerator means no tolerance is needed."""
    import random

    from fabrix_spark.operators.metrics import ks_statistic

    rng = random.Random(29)
    for trial in range(5):
        av = [rng.randint(0, 12) for _ in range(rng.randint(1, 60))]
        bv = [rng.randint(6, 18) for _ in range(rng.randint(1, 60))]
        a = spark.createDataFrame(
            [(float(x),) for x in av] + [(None,)], "v double"
        )
        b = spark.createDataFrame(
            [(float(x),) for x in bv] + [(None,)], "v double"
        )
        row = ks_statistic(a, b, "v").collect()[0]
        na, nb = len(av), len(bv)
        dn = max(
            abs(
                sum(1 for x in av if x <= t) * nb
                - sum(1 for x in bv if x <= t) * na
            )
            for t in set(av + bv)
        )
        assert (row["n_a"], row["n_b"], int(row["d_num"]), row["d_micro"]) == (
            na,
            nb,
            dn,
            dn * 1_000_000 // (na * nb),
        ), trial


def test_ks_statistic_plan_no_single_reducer(spark):
    """The KS cumulative pass is the range-partitioned global_cumsum —
    the window is PARTITIONED by the range-partition id, never global,
    and the only nested-loop is the 1-row totals broadcast."""
    from fabrix_spark.operators.metrics import ks_statistic

    a = spark.createDataFrame([(float(i % 7),) for i in range(40)], "v double")
    b = spark.createDataFrame([(float(i % 5),) for i in range(40)], "v double")
    p = (
        ks_statistic(a, b, "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(__fx_pid__" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert p.count("BroadcastNestedLoopJoin") == 1  # the totals row


def test_logreg_gd_matches_python_replay(spark):
    """train.logreg_gd's weight trajectory equals an exact Python-int
    replay of the same integer recipe (fast-sigmoid link via
    truncation-toward-zero division) on random integer features —
    the bit-for-bit contract its SQL oracle relies on. Also pins the
    NULL-row exclusion and the empty/zero-dim errors."""
    import random

    import pytest

    from fabrix_spark.operators.train import _div_trunc, logreg_gd

    rng = random.Random(41)
    data = [
        (rng.randint(-500, 1500), rng.randint(0, 1)) for _ in range(80)
    ]
    df = spark.createDataFrame(data + [(None, 1)], "x long, y int")
    out = logreg_gd(
        df, [F.lit(1000), F.col("x")], F.col("y"), iters=4, lr_num=1, lr_den=50
    ).collect()
    got = {(r["iteration"], r["j"]): r["w"] for r in out}

    def link(z: int) -> int:
        return 500000 + _div_trunc(z * 500000, 1_000_000 + abs(z))

    w = [0, 0]
    n = len(data)
    want = {}
    for it in range(1, 5):
        g = [0, 0]
        for x, y in data:
            xs = [1000, x]
            z = sum(wj * xj for wj, xj in zip(w, xs))
            r = link(z) - y * 1_000_000
            for j in range(2):
                g[j] += xs[j] * r
        for j in range(2):
            w[j] = w[j] - _div_trunc(g[j], n * 50)
            want[(it, j)] = w[j]
    assert got == want

    with pytest.raises(ValueError, match="at least one feature"):
        logreg_gd(df, [], F.col("y"))
    empty = spark.createDataFrame([], "x long, y int")
    with pytest.raises(ValueError, match="empty training set"):
        logreg_gd(empty, [F.col("x")], F.col("y"))


def test_gini_best_split_matches_bruteforce(spark):
    """gini_best_split == the O(values·n) brute-force scorer on random
    integer features: same per-feature best threshold under the
    (score_q DESC, threshold ASC) tie-break, same exact counts, and a
    perfectly separable feature scores exactly n·scale (pure split).
    NULL labels drop rows; NULL feature values drop only that
    feature's histogram rows."""
    import random

    from fabrix_spark.operators.train import _div_trunc, gini_best_split

    rng = random.Random(53)
    data = [
        (rng.randint(0, 8), rng.randint(0, 3), rng.randint(0, 1))
        for _ in range(120)
    ]
    rows = [
        (a, b, y, y) for a, b, y in data
    ]  # 'sep' mirrors the label -> perfectly separable at threshold 0
    df = spark.createDataFrame(
        rows + [(None, 0, 1, None), (0, None, 1, 1)],
        "a long, b long, sep long, y int",
    )
    got = {
        r["feature"]: r
        for r in gini_best_split(
            df,
            [("a", F.col("a")), ("b", F.col("b")), ("sep", F.col("sep"))],
            F.col("y"),
        ).collect()
    }

    def brute(vals_y):
        n, p = len(vals_y), sum(y for _, y in vals_y)
        best = None
        for t in sorted({v for v, _ in vals_y})[:-1]:
            nl = sum(1 for v, _ in vals_y if v <= t)
            pl = sum(y for v, y in vals_y if v <= t)
            nr, pr = n - nl, p - pl
            num = (pl * pl + (nl - pl) ** 2) * nr + (
                pr * pr + (nr - pr) ** 2
            ) * nl
            sq = _div_trunc(num * 1_000_000, nl * nr)
            key = (-sq, t)
            if best is None or key < best[0]:
                best = (key, (t, nl, nr, pl, pr, sq))
        return best[1]

    # the label column y survives NULL-label exclusion only
    clean = [(a, b, s, y) for a, b, s, y in rows]
    for fname, idx in (("a", 0), ("b", 1), ("sep", 2)):
        vals_y = [(r[idx], r[3]) for r in clean if r[idx] is not None]
        # the NULL-b extra row (a=0, sep=1, y=1) feeds a and sep only;
        # the NULL-label extra row feeds nothing
        if fname == "a":
            vals_y += [(0, 1)]
        if fname == "sep":
            vals_y += [(1, 1)]
        t, nl, nr, pl, pr, sq = brute(vals_y)
        r = got[fname]
        assert (
            r["threshold"],
            r["n_left"],
            r["n_right"],
            r["pos_left"],
            r["pos_right"],
            r["score_q"],
        ) == (t, nl, nr, pl, pr, sq), fname
    # separable feature: its own label split is pure -> S = n exactly
    n_sep = len(clean) + 1
    assert got["sep"]["score_q"] == n_sep * 1_000_000


def test_nb_train_predict_recovers_classes(spark):
    """nb_train_predict on a corpus with disjoint class vocabularies
    recovers every training label (the training-fit sanity every NB
    implementation must pass), scores strictly beat the runner-up, and
    a token-free document is absent from the output."""
    from fabrix_spark.operators.train import nb_train_predict

    rows = []
    vocab = {"aa": "red red rouge crimson", "bb": "blue azure navy blue"}
    for i in range(20):
        cls = "aa" if i % 2 == 0 else "bb"
        rows.append((i, vocab[cls], cls))
    rows.append((99, "   ", "aa"))  # token-free: absent from output
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_predict(df, "lang", dim=64).collect()}
    assert 99 not in out and len(out) == 20
    for i in range(20):
        assert out[i]["pred"] == ("aa" if i % 2 == 0 else "bb"), i
        assert out[i]["score_micro"] < 0  # log-probs are negative


def test_nb_train_predict_plan_broadcasts_model(spark):
    """The likelihood and prior tables (classes×dim metadata) reach
    the per-document features through BROADCAST joins only — a
    SortMergeJoin there would shuffle the corpus against metadata."""
    from fabrix_spark.operators.train import nb_train_predict

    df = spark.createDataFrame(
        [(i, "alpha beta gamma", "x" if i % 2 else "y") for i in range(8)],
        "doc_id long, text string, lang string",
    )
    p = (
        nb_train_predict(df, "lang", dim=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the corpus-side join on feature must not sort-merge
    assert "SortMergeJoin" not in p


def test_logreg_gd_extreme_magnitudes_no_wrap(spark):
    """The link evaluates in decimal(38,0): with |x| ~ 1e9 and an
    aggressive learning rate, |z| grows far past the int64 product
    bound (z·500000 would wrap a long), yet the weight trajectory
    still equals the arbitrary-precision Python replay — the same
    silent-wrap class the gram_matrix guard closes, closed here by
    construction."""
    from fabrix_spark.operators.train import _div_trunc, logreg_gd

    data = [(10**9, 1), (-(10**9), 0), (999_999_999, 1), (-999_999_998, 0)]
    df = spark.createDataFrame(data, "x long, y int")
    out = logreg_gd(df, [F.col("x")], F.col("y"), iters=3, lr_num=1, lr_den=1)
    got = {(r["iteration"], r["j"]): r["w"] for r in out.collect()}

    def link(z: int) -> int:
        return 500000 + _div_trunc(z * 500000, 1_000_000 + abs(z))

    w = [0]
    n = len(data)
    want = {}
    for it in range(1, 4):
        g = [0]
        for x, y in data:
            z = w[0] * x
            assert it == 1 or abs(z) * 500000 > (1 << 63)  # long WOULD wrap
            g[0] += x * (link(z) - y * 1_000_000)
        w[0] = w[0] - _div_trunc(g[0], n * 1)
        want[(it, 0)] = w[0]
    assert got == want


def test_train_guards_fire_loudly(spark):
    """A diverging GD run (weight leaving int64) and duplicate gini
    feature names raise clear errors instead of wrapping / silently
    merging histograms."""
    import pytest

    from fabrix_spark.operators.train import gini_best_split, logreg_gd

    df = spark.createDataFrame(
        [(10**9, 1), (-(10**9), 0)] * 4, "x long, y int"
    )
    with pytest.raises(ValueError, match="int64"):
        # lr multiplies the ~1e15 gradient straight past 2^62
        logreg_gd(df, [F.col("x")], F.col("y"), iters=8, lr_num=10**6, lr_den=1)
    with pytest.raises(ValueError, match="duplicate feature names"):
        gini_best_split(df, [("x", F.col("x")), ("x", F.col("y"))], F.col("y"))


def test_k_core_matches_python_peeling(spark):
    """k_core == an exact Python replay of synchronous peeling on a
    hand-built graph with a cascade: removing the lowest-degree node
    pushes its neighbor below k in the NEXT round (the reason peeling
    iterates), and the 2-core of a triangle-with-tail is the
    triangle."""
    from fabrix_spark.operators.graph import k_core

    # triangle (1,2,3) + a path 3-4-5: 2-core = the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["degree"]) for r in k_core(df, k=2, iters=5).collect()
    )
    assert got == [(1, 2), (2, 2), (3, 2)]
    # cascade check: one round only removes node 5 (deg 1); node 4
    # still has deg 2 after round 1's SIMULTANEOUS filter (edges to 3
    # and 5 counted from the pre-round graph minus removed endpoints)
    one = sorted(r["node"] for r in k_core(df, k=2, iters=1).collect())
    assert 4 in one and 5 not in one
    # k above the max degree empties the graph
    assert k_core(df, k=10, iters=3).count() == 0


def _py_k_core(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peeling run to convergence: synchronous rounds, each
    dropping every node under degree k, until nothing changes."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    while True:
        deg: dict[int, int] = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in und if a in keep and b in keep}
        if nxt == und:
            break
        und = nxt
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    return deg


@pytest.mark.slow
def test_k_core_until_stable_runs_to_fixpoint(spark):
    """until_stable=True peels to the TRUE k-core on a graph where the
    default 5 iterations are provably NOT enough: a triangle with a
    12-node tail chain peels one chain layer per round (~12 rounds),
    so fixed iters=5 still holds chain remnants while until_stable
    matches the Python run-to-convergence reference exactly."""
    from fabrix_spark.operators.graph import k_core

    edges = [(100, 101), (101, 102), (100, 102)]  # the surviving 2-core
    chain = [102] + list(range(1, 13))
    edges += list(zip(chain, chain[1:]))  # 102-1-2-...-12
    df = spark.createDataFrame(edges, "src long, dst long")
    # the premise: 5 fixed rounds have NOT converged on this graph
    assert k_core(df, k=2, iters=5).count() > 3
    got = sorted(
        (r["node"], r["degree"])
        for r in k_core(df, k=2, until_stable=True).collect()
    )
    assert got == sorted(_py_k_core(edges, 2).items())
    assert got == [(100, 2), (101, 2), (102, 2)]
    # checkpoint=False takes the same fixpoint on a SHORT chain (the
    # per-round count still drives convergence) — short because each
    # uncheckpointed round nests the previous plan ~4×, so a long
    # chain's lazy lineage makes Catalyst optimization itself blow up:
    # exactly why checkpoint=True is the default for the loop
    short = [(100, 101), (101, 102), (100, 102), (102, 1), (1, 2)]
    sdf = spark.createDataFrame(short, "src long, dst long")
    got_nc = sorted(
        r["node"]
        for r in k_core(sdf, k=2, until_stable=True, checkpoint=False).collect()
    )
    assert got_nc == [100, 101, 102]


def test_k_core_until_stable_max_rounds_guard(spark):
    """A max_rounds too small for the chain raises the descriptive
    error instead of silently returning a non-core."""
    import pytest

    from fabrix_spark.operators.graph import k_core

    chain = list(range(1, 13))
    df = spark.createDataFrame(
        list(zip(chain, chain[1:])), "src long, dst long"
    )
    with pytest.raises(ValueError, match="max_rounds"):
        k_core(df, k=2, until_stable=True, max_rounds=2)


def test_nb_train_predict_scores_held_out_frame(spark):
    """score_df trains on one split and classifies the OTHER: held-out
    docs drawn from the disjoint class vocabularies get the right
    class even though their ids never appeared in training, and the
    default (score_df=None) diagnostic output is unchanged by the
    parameter's existence."""
    from fabrix_spark.operators.train import nb_train_predict

    vocab = {"aa": "red rouge crimson red", "bb": "blue azure navy blue"}
    train_rows = [
        (i, vocab["aa" if i % 2 == 0 else "bb"], "aa" if i % 2 == 0 else "bb")
        for i in range(20)
    ]
    train = spark.createDataFrame(
        train_rows, "doc_id long, text string, lang string"
    )
    heldout = spark.createDataFrame(
        [(1001, "crimson rouge"), (1002, "navy azure"), (1003, "   ")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["pred"]
        for r in nb_train_predict(train, "lang", dim=64, score_df=heldout).collect()
    }
    # only held-out ids appear; token-free held-out doc is absent
    assert out == {1001: "aa", 1002: "bb"}
    # default path unchanged: scores the training corpus itself
    diag = nb_train_predict(train, "lang", dim=64).collect()
    assert sorted(r["doc_id"] for r in diag) == list(range(20))


def test_ks_statistic_empty_cohorts_zero_rows(spark):
    """Two empty cohorts return ZERO rows (matching the GROUP-BY
    oracle shape), not one all-NULL row; one-sided emptiness still
    returns the single exact row with n of the empty side = 0."""
    from fabrix_spark.operators.metrics import ks_statistic

    empty = spark.createDataFrame([], "v double")
    assert ks_statistic(empty, empty, "v").count() == 0
    b = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    row = ks_statistic(empty, b, "v").collect()[0]
    assert (row["n_a"], row["n_b"], int(row["d_num"])) == (0, 2, 0)
    assert row["d_micro"] is None  # one-sided D undefined; DuckDB // 0 is NULL


def test_weighted_reservoir_matches_python_reference(spark):
    """weighted_reservoir selects the exact k rows a Python replay of
    the Efraimidis–Spirakis key recipe selects (md5 52-bit uniform →
    nano-nat ln → single-division ratio), excludes non-positive
    weights, and oversamples heavy rows (the heaviest-weight row
    always beats a zero-ish-weight row with the same uniform)."""
    import hashlib
    import math

    from fabrix_spark.operators.sampling import weighted_reservoir

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)] + [
        (900, 0),
        (901, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        r["doc_id"]
        for r in weighted_reservoir(df, "doc_id", F.col("w"), k=25).collect()
    )

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        t = round(math.log((h + 1) / float(1 << 52)) * 1_000_000_000)
        return (t / w, -i)  # DESC t/w, ASC id

    want = sorted(
        i
        for i, w in sorted(
            ((i, w) for i, w in rows if w), key=lambda p: key(*p), reverse=True
        )[:25]
    )
    assert got == want
    assert 900 not in got and 901 not in got

    # a fractional weight type is rejected loudly — cast-to-long would
    # silently truncate sub-1 quality scores to 0 and drop those rows
    import pytest

    fdf = spark.createDataFrame([(1, 0.7)], "doc_id long, q double")
    with pytest.raises(ValueError, match="fractional"):
        weighted_reservoir(fdf, "doc_id", F.col("q"), k=1)


def test_ks_statistic_float_ties_fuzz(spark):
    """KS over FLOAT values whose cohorts share exact tie points
    (quantized doubles — the production case): still equals the
    brute-force supremum, because the grid is the union's distinct
    values and the counts are exact integers regardless of the value
    type."""
    import random

    from fabrix_spark.operators.metrics import ks_statistic

    rng = random.Random(67)
    vals = [round(rng.uniform(-2, 2), 2) for _ in range(25)]  # shared pool
    av = [rng.choice(vals) for _ in range(50)]
    bv = [rng.choice(vals) for _ in range(70)]
    a = spark.createDataFrame([(x,) for x in av], "v double")
    b = spark.createDataFrame([(x,) for x in bv], "v double")
    row = ks_statistic(a, b, "v").collect()[0]
    na, nb = len(av), len(bv)
    dn = max(
        abs(
            sum(1 for x in av if x <= t) * nb
            - sum(1 for x in bv if x <= t) * na
        )
        for t in set(av + bv)
    )
    assert (row["n_a"], row["n_b"], int(row["d_num"]), row["d_micro"]) == (
        na,
        nb,
        dn,
        dn * 1_000_000 // (na * nb),
    )


def test_power_iteration_top_dominant_direction():
    """power_iteration_top converges to the dominant eigendirection of
    an integer PSD matrix (|cos| vs numpy's eigenvector > 0.999 after
    a few iterations) and reports zeros for the zero matrix."""
    import numpy as np

    from fabrix_spark.operators.similarity import power_iteration_top

    rng = np.random.default_rng(7)
    a = rng.integers(-50, 50, size=(40, 6)).astype(np.int64)
    a[:, 0] += 200  # plant a dominant direction
    G = a.T @ a
    rows = [(i, j, int(G[i, j])) for i in range(6) for j in range(6)]
    v = np.array(power_iteration_top(rows, dim=6, iters=12), dtype=np.float64)
    w_, vecs = np.linalg.eigh(G.astype(np.float64))
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    assert power_iteration_top([], dim=4, iters=3) == [0, 0, 0, 0]


def test_gram_with_sums_sentinels_and_centered_direction(spark):
    """gram_matrix(with_sums=True) emits exact column-sum/(−1,−1,n)
    sentinels from the same pass, and the centered power iteration
    aligns with numpy's top COVARIANCE eigendirection on data whose
    mean dominates the uncentered Gram (the case centering exists
    for)."""
    import numpy as np

    from fabrix_spark.operators.similarity import gram_matrix, power_iteration_top

    rng = np.random.default_rng(3)
    # big constant mean + variance concentrated on a different axis
    base = np.array([8.0, 8.0, 8.0])
    spread_axis = np.array([1.0, -1.0, 0.0])
    data = base + np.outer(rng.normal(0, 1, 200), spread_axis) / 4
    df = spark.createDataFrame(
        [([float(x) for x in row],) for row in data], "embedding array<float>"
    )
    rows = gram_matrix(df, quantize=1000, with_sums=True).collect()
    q = np.array(
        [[round(float(np.float32(x)) * 1000) for x in row] for row in data],
        dtype=np.int64,
    )
    sums, n, gram_rows = [0] * 3, 0, []
    for r in rows:
        if r["i"] == -1:
            n = int(r["g"])
        elif r["j"] == -1:
            sums[r["i"]] = int(r["g"])
        else:
            gram_rows.append((r["i"], r["j"], int(r["g"])))
    assert n == 200
    assert sums == [int(s) for s in q.sum(axis=0)]
    assert dict(((i, j), g) for i, j, g in gram_rows) == {
        (i, j): int((q.T @ q)[i, j]) for i in range(3) for j in range(3)
    }

    v = np.array(
        power_iteration_top(gram_rows, dim=3, iters=12, sums=sums, n=n),
        dtype=np.float64,
    )
    cov = np.cov(q.T.astype(np.float64), bias=True)
    w, vecs = np.linalg.eigh(cov)
    cos = abs(v @ vecs[:, -1]) / (np.linalg.norm(v) * np.linalg.norm(vecs[:, -1]))
    assert cos > 0.999
    # and the UNCENTERED direction is the mean axis, not the variance
    # axis — the contrast that motivates the centered variant
    u = np.array(power_iteration_top(gram_rows, dim=3, iters=12), dtype=np.float64)
    mean_axis = q.mean(axis=0)
    cos_mean = abs(u @ mean_axis) / (np.linalg.norm(u) * np.linalg.norm(mean_axis))
    assert cos_mean > 0.999


def test_target_mix_sample_quota_semantics(spark):
    """target_mix_sample: the scarcest-relative-to-weight group is
    kept WHOLE, other quotas are floor(w_g·a_m/w_m) via the
    min-of-floors identity, unweighted groups drop, and a weighted
    group with no rows zeroes every quota."""
    from fabrix_spark.operators.sampling import target_mix_sample

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(9)]   # binding: 9/10 < 100/50
        + [(2000 + i, "c") for i in range(50)]
        + [(3000, "zz")]                         # unweighted: dropped
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    w = {"a": 50, "b": 10, "c": 20}
    got = target_mix_sample(df, w, group_col="lang", key="doc_id")
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # lambda = 9/10: a -> floor(50*9/10)=45, b -> 9 (whole), c -> floor(20*9/10)=18
    assert counts == {"a": 45, "b": 9, "c": 18}
    # per-group ranks are 1..keep_g and stable across reruns
    again = target_mix_sample(df, w, group_col="lang", key="doc_id")
    assert sorted(map(tuple, got.select("doc_id", "grp_rank").collect())) == sorted(
        map(tuple, again.select("doc_id", "grp_rank").collect())
    )
    ranks = {r["lang"]: r["m"] for r in got.groupBy("lang").agg(F.max("grp_rank").alias("m")).collect()}
    assert ranks == {"a": 45, "b": 9, "c": 18}
    # weighted group absent from the data -> mix unachievable -> empty
    empty = target_mix_sample(df, {"a": 1, "nope": 1}, group_col="lang", key="doc_id")
    assert empty.count() == 0


def test_pca_project_exact_integer_dot(spark):
    """pca_project == the exact integer dot of the JVM-quantized
    vector with the literal component; NULL vectors excluded."""
    from fabrix_spark.operators.similarity import pca_project

    comp = [3, -2, 5]
    rows = [(1, [0.5, -0.25, 1.0]), (2, [0.125, 0.0, -0.5]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {
        r["vec_id"]: r["proj_q"]
        for r in pca_project(df, comp, quantize=1000).collect()
    }
    want = {
        i: sum(round(x * 1000) * c for x, c in zip(v, comp))
        for i, v in [(1, rows[0][1]), (2, rows[1][1])]
    }
    assert got == want


def test_knn_label_disagreement_flags_planted_outlier(spark, tmp_path):
    """The staged label-noise screen flags exactly the probe whose
    label disagrees with its 5-NN majority: probe 0 sits inside the
    label-1 cluster but carries label 9 (planted noise); probes 25/50
    sit in the label-2 cluster with the right label."""
    from fabrix_spark.queries import STAGED

    def vec(axis, i):
        v = [0.0] * 8
        v[axis] = 1.0
        v[7] = 0.01 * i
        return v

    rows = [(0, vec(0, 3), 9)]                      # planted outlier
    rows += [(i, vec(0, i), 1) for i in range(1, 9)]     # cluster A
    rows += [(25, vec(1, 12), 2), (50, vec(1, 13), 2)]   # probes in B
    rows += [(i, vec(1, i - 25), 2) for i in range(26, 32)]  # cluster B
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r["vec_id"]: r
        for r in STAGED["ml_knn_label_disagreement"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 25, 50}
    assert got[0]["flagged"] and got[0]["knn_label"] == 1 and got[0]["label"] == 9
    assert got[0]["n_votes"] == 5
    assert not got[25]["flagged"] and got[25]["knn_label"] == 2
    assert not got[50]["flagged"]


def test_auc_by_group_matches_pairwise(spark):
    """auc_by_group == the brute-force pairwise AUC within each group,
    with ties half-counted; single-class groups emit NULL auc."""
    from fabrix_spark.operators.metrics import auc_by_group

    rows = [
        ("a", 0.1, True), ("a", 0.4, False), ("a", 0.4, True), ("a", 0.9, False),
        ("b", 0.2, True), ("b", 0.3, True), ("b", 0.1, False),
        ("c", 0.5, True), ("c", 0.7, True),          # single-class
        ("a", None, True),                           # unscored: excluded
    ]
    df = spark.createDataFrame(rows, "seg string, score double, pos boolean")
    got = {
        r["seg"]: r
        for r in auc_by_group(df, "score", F.col("pos"), ["seg"]).collect()
    }
    for seg in ("a", "b"):
        pos = [s for g, s, p in rows if g == seg and p and s is not None]
        neg = [s for g, s, p in rows if g == seg and not p and s is not None]
        want = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg) / (
            len(pos) * len(neg)
        )
        assert abs(got[seg]["auc"] - want) < 1e-12, seg
        assert got[seg]["n_pos"] == len(pos) and got[seg]["n_neg"] == len(neg)
    assert got["c"]["auc"] is None and got["c"]["n_neg"] == 0


def test_auc_by_group_global_cumsum_path(spark):
    """via='global_cumsum' — the wide-segment path for low-cardinality
    segmentation (2 skewed A/B arms here, one with many distinct raw
    scores) — returns exactly the window path's rows, including a NULL
    group key (the prefix-base join is NULL-safe) and a single-class
    segment. This pins the scale contract in the docstring: same
    values, no per-segment reducer."""
    import random

    from fabrix_spark.operators.metrics import auc_by_group

    rnd = random.Random(12)
    rows = [("A", rnd.random(), rnd.random() < 0.3) for _ in range(400)]
    rows += [("B", rnd.choice([0.2, 0.5, 0.9]), rnd.random() < 0.7) for _ in range(23)]
    rows += [(None, rnd.random(), rnd.random() < 0.5) for _ in range(31)]
    rows += [("C", 0.4, True), ("C", 0.6, True)]     # single-class
    rows += [("A", None, True)]                      # unscored: excluded
    df = spark.createDataFrame(rows, "seg string, score double, pos boolean")

    def _key(recs):
        return sorted(
            (
                (r["seg"] or "", r["n"], r["n_pos"], r["n_neg"],
                 -1.0 if r["auc"] is None else round(r["auc"], 12))
                for r in recs
            )
        )

    via_window = _key(auc_by_group(df, "score", F.col("pos"), ["seg"]).collect())
    via_gcs = _key(
        auc_by_group(
            df, "score", F.col("pos"), ["seg"], via="global_cumsum"
        ).collect()
    )
    assert via_gcs == via_window
    assert len(via_gcs) == 4  # A, B, C, NULL segment all present


def test_standardize_by_group_matches_global_per_slice(spark):
    """standardize(by=[g]) on the union == standardize() run on each
    group's rows alone — the group mode must not leak moments across
    groups; constant groups emit NULL z."""
    from fabrix_spark.operators.features import standardize

    rows = [
        ("en", 1, 10), ("en", 2, 20), ("en", 3, 60),
        ("fr", 4, 5), ("fr", 5, 7),
        ("zh", 6, 9), ("zh", 7, 9),   # constant -> z NULL, minmax NULL
        (None, 8, 100), (None, 9, 300),  # NULL group key: kept, own stats
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n long")
    out = standardize(df, "n", by=["lang"]).collect()
    assert len(out) == len(rows)  # null-safe join: no silent row loss
    got = {r["doc_id"]: (r["z"], r["minmax"]) for r in out}
    # the NULL-lang pair standardizes within ITS OWN group
    assert abs(got[8][0] + 2 ** -0.5) < 1e-12 and got[8][1] == 0.0
    assert abs(got[9][0] - 2 ** -0.5) < 1e-12 and got[9][1] == 1.0
    for lang in ("en", "fr", "zh"):
        alone = {
            r["doc_id"]: (r["z"], r["minmax"])
            for r in standardize(df.filter(F.col("lang") == lang), "n").collect()
        }
        for k, v in alone.items():
            assert got[k] == v, (lang, k)
    assert got[6] == (None, None) and got[7] == (None, None)


def test_quantile_bins_by_group_matches_global_per_slice(spark):
    """quantile_bins(by=[g]) == quantile_bins() run on each group's
    rows alone — per-group boundaries must not leak across groups;
    ties share a bin within their group."""
    from fabrix_spark.operators.features import quantile_bins

    rows = (
        [("en", i, v) for i, v in enumerate([1, 2, 2, 3, 50, 60, 70, 80])]
        + [("fr", 100 + i, v) for i, v in enumerate([5, 5, 5, 9])]
        + [(None, 200, 1), (None, 201, 2)]  # NULL group key: kept
        + [("de", 300, None)]  # all-NULL-value group: kept with bin 1
    )
    df = spark.createDataFrame(rows, "lang string, doc_id long, n long")
    out = quantile_bins(df, "n", 4, by=["lang"]).collect()
    assert len(out) == len(rows)  # null-safe LEFT join: no row loss
    got = {r["doc_id"]: r["bin"] for r in out}
    # NULL group bins its own {1,2}: bounds (1,1,2) -> bins 1 and 3
    assert got[200] == 1 and got[201] == 3
    assert got[300] == 1  # matches the global path's NULL-value bin
    for lang in ("en", "fr"):
        alone = {
            r["doc_id"]: r["bin"]
            for r in quantile_bins(df.filter(F.col("lang") == lang), "n", 4).collect()
        }
        for k, v in alone.items():
            assert got[k] == v, (lang, k)
    # fr ties on 5 share one bin; 9 lands in the top bin
    assert got[100] == got[101] == got[102] and got[103] == 4


def test_bpe_encode_shuffle_join_path_matches_broadcast(spark):
    """broadcast_vocab=False (the huge-vocab escape hatch) produces the
    identical token stream through an optimizer-chosen join."""
    from fabrix_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(0, "low lower newest"), (1, "aaaa low")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w"), ("a", "a")]
    a = sorted(map(tuple, bpe_encode(df, merges).collect()))
    b = sorted(map(tuple, bpe_encode(df, merges, broadcast_vocab=False).collect()))
    assert a == b and len(a) > 0


def test_bpe_train_early_stop_matches_twin(spark):
    """When merges exhaust before n_merges (best pair drops under
    min_freq), the trainer's break and the oracle's empty-best
    fallback branches agree: both emit exactly the found merges."""
    import duckdb

    from fabrix_spark.operators.text import bpe_train

    docs = ["low low", "ab ab"]  # exhausts after 3 merges at min_freq=2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = [
        (r["iteration"], r["left"], r["right"], r["freq"])
        for r in bpe_train(df, n_merges=8, min_freq=2).orderBy("iteration").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(docs):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    want = [tuple(r) for r in con.execute(_bpe_twin_sql(8)).fetchall()]
    assert got == want and len(got) == 3


def test_bm25_fused_empty_terms_raises(spark):
    """The fused path keeps the index path's empty-terms guard instead
    of dying with AttributeError from the never-run term loop."""
    from fabrix_spark.operators.search import bm25_scores_fused

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one term"):
        bm25_scores_fused(df, [])


def test_canonical_url_cases_and_duckdb_twin(spark):
    """canonical_url over the crawler edge cases — mixed-case
    scheme/host, default ports, fragments, tracking params, unsorted
    params, empty query, bare host — plus a DuckDB SQL twin of the
    whole expression (the r12 oracle recipe for URL dedup keys)."""
    import duckdb

    from fabrix_spark.operators.text import canonical_url

    cases = [
        # (input, expected canonical)
        ("HTTPS://Example.COM:443/a/b?b=2&a=1#frag", "https://example.com/a/b?a=1&b=2"),
        ("http://Example.com:80/", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("https://h.io/p?utm_source=x&a=1&utm_medium=y", "https://h.io/p?a=1"),
        ("https://h.io/p?gclid=abc&fbclid=def", "https://h.io/p"),
        ("https://h.io/p?", "https://h.io/p"),
        ("https://h.io:8443/p?z=1", "https://h.io:8443/p?z=1"),  # non-default port kept
        ("http://a.b/path/With/Case?Q=V", "http://a.b/path/With/Case?Q=V"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)

    con = duckdb.connect()
    con.execute("CREATE TABLE urls(i BIGINT, url VARCHAR)")
    for i, (u, _) in enumerate(cases):
        con.execute("INSERT INTO urls VALUES (?, ?)", [i, u])
    twin = {
        i: c
        for i, c in con.execute("""
WITH s AS (
  SELECT i, split_part(url, '#', 1) AS nf FROM urls
),
parts AS (
  SELECT i, nf, split_part(nf, '?', 1) AS pre,
         CASE WHEN strpos(nf, '?') > 0 THEN substr(nf, strpos(nf, '?') + 1) END AS query
  FROM s
),
hp AS (
  SELECT i, query,
         lower(split_part(pre, '://', 1)) AS scheme,
         split_part(pre, '://', 2) AS hostpath
  FROM parts
),
comp AS (
  SELECT i, query, scheme,
         lower(split_part(hostpath, '/', 1)) AS host,
         CASE WHEN strpos(hostpath, '/') > 0
              THEN substr(hostpath, strpos(hostpath, '/')) ELSE '/' END AS path
  FROM hp
),
ports AS (
  SELECT i, query, scheme, path,
         CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
              ELSE host END AS host
  FROM comp
),
params AS (
  SELECT *, list_sort(list_filter(string_split(query, '&'),
           p -> NOT (p = '' OR p LIKE 'utm_%' OR p LIKE 'gclid=%'
                     OR p LIKE 'fbclid=%' OR p LIKE 'msclkid=%'
                     OR p LIKE 'mc_eid=%'))) AS kept
  FROM ports
)
SELECT i, scheme || '://' || host || path ||
       CASE WHEN query IS NOT NULL AND len(kept) > 0
            THEN '?' || array_to_string(kept, '&') ELSE '' END AS c
FROM params
""").fetchall()
    }
    assert twin == got


def test_calibration_bins_by_group_matches_per_slice(spark):
    """calibration_bins(by=[g]) == calibration_bins() on each group's
    rows alone — still one aggregate, keyed by (group, bin)."""
    from fabrix_spark.operators.metrics import calibration_bins

    rows = [
        ("a", 0.05, False), ("a", 0.12, True), ("a", 0.95, True),
        ("b", 0.05, True), ("b", 0.55, False), ("b", None, True),
    ]
    df = spark.createDataFrame(rows, "seg string, score double, pos boolean")
    got = {
        (r["seg"], r["bin"]): tuple(r)[1:]
        for r in calibration_bins(df, "score", F.col("pos"), n_bins=10, by=["seg"]).collect()
    }
    for seg in ("a", "b"):
        alone = {
            (seg, r["bin"]): tuple(r)
            for r in calibration_bins(
                df.filter(F.col("seg") == seg), "score", F.col("pos"), n_bins=10
            ).collect()
        }
        for k, v in alone.items():
            assert got[k] == v, k
    assert len(got) == 5  # b's NULL-score row excluded, not a 6th bin


def test_fuzzy_join_model(spark):
    """Two-table fuzzy match semantics: a probe row finds its lightly
    edited master twin (prefix OR suffix route); an identical row in
    both tables matches at dist 0; a hot master opening is purged on
    the REF side only; singleton ref blocks match (no n>=2 floor)."""
    from fabrix_spark.operators.dedup import fuzzy_join

    master = [
        (100, "alpha beta gamma delta epsilon zeta", "en"),
        (101, "one two three four five six seven", "en"),
        (102, "unrelated content entirely here now", "en"),
    ]
    probes = [
        (1, "alpha beta gamma delt0 epsilon zeta", "en"),   # 1 edit off 100
        (2, "one two three four five six seven", "en"),     # exact copy of 101
        (3, "ZZZZZZZZZZZZ completely different YYYYYYYYYYYY", "en"),
        (4, "alpha beta gamma delta epsilon zeta", "fr"),   # wrong scope
    ]
    got = {
        (r["probe_id"], r["ref_id"]): r["dist"]
        for r in fuzzy_join(
            spark.createDataFrame(probes, "doc_id long, text string, lang string"),
            spark.createDataFrame(master, "doc_id long, text string, lang string"),
            key_len=8,
            pct_threshold=30,
        ).collect()
    }
    assert got[(1, 100)] == 1
    assert got[(2, 101)] == 0
    assert all(p != 3 and p != 4 for p, _ in got)

    # hot master opening: 5 master rows share the 8-char prefix; with
    # block_cap=4 the prefix block purges, but row 200's distinct
    # suffix still routes the probe to it
    hot = [(200 + i, f"common opening unique tail {i}", "en") for i in range(5)]
    probe2 = [(9, "common opening unique tail 0x", "en")]
    got2 = {
        (r["probe_id"], r["ref_id"])
        for r in fuzzy_join(
            spark.createDataFrame(probe2, "doc_id long, text string, lang string"),
            spark.createDataFrame(hot, "doc_id long, text string, lang string"),
            key_len=8,
            block_cap=4,
            pct_threshold=30,
        ).collect()
    }
    assert got2 == set()  # prefix purged AND suffixes all differ
    got3 = {
        (r["probe_id"], r["ref_id"])
        for r in fuzzy_join(
            spark.createDataFrame(probe2, "doc_id long, text string, lang string"),
            spark.createDataFrame(hot, "doc_id long, text string, lang string"),
            key_len=8,
            block_cap=64,
            pct_threshold=30,
        ).collect()
    }
    assert (9, 200) in got3  # unpurged prefix block routes to the near-dup


def test_features_null_category_and_singleton_group_contracts(spark):
    """standardize: a singleton group's variance is 0/0 = NaN and NaN
    compares > 0 in Spark, so pre-fix z was NaN instead of the
    documented NULL. target_encode_loo: the stats join must be
    null-safe (pre-fix NULL-category rows were silently DELETED by the
    inner equi-join) and the denominator counts non-NULL targets only
    (pre-fix a NULL-target row inflated its category's divisor while
    contributing nothing to the sum)."""
    import math

    import pytest

    from fabrix_spark.operators.features import (
        quantile_bins,
        standardize,
        target_encode_loo,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 7), (None, 5), (None, 9)],
        "g string, x long",
    )
    z = {
        (r["g"], r["x"]): r["z"]
        for r in standardize(df, "x", by=["g"]).collect()
    }
    assert z[("b", 7)] is None  # singleton group: NULL, never NaN
    assert all(v is None or not math.isnan(v) for v in z.values())
    assert z[("a", 10)] is not None  # real groups still standardized

    enc_df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", None), (None, 4), (None, 8)],
        "cat string, y long",
    )
    out = {
        (r["cat"], r["y"]): r["loo_enc"]
        for r in target_encode_loo(enc_df, "cat", F.col("y")).collect()
    }
    assert len(out) == 5  # NULL-category rows survive
    # category "a": two real targets; each row's LOO mean is the OTHER
    # real value — the NULL-target row must not inflate the divisor
    assert out[("a", 10)] == 20.0
    assert out[("a", 20)] == 10.0
    assert out[("a", None)] is None
    # the NULL category is its own group
    assert out[(None, 4)] == 8.0
    assert out[(None, 8)] == 4.0

    with pytest.raises(ValueError, match="bucket count"):
        quantile_bins(df, "x", 0)


def test_correlation_constant_column_yields_null_not_crash(spark):
    """Pearson r of a constant column is undefined: den = 0, and under
    ANSI mode the pre-fix bare division was TASK-KILLING (DIVIDE_BY_
    ZERO), not NaN."""
    from fabrix_spark.operators.profile import correlation

    df = spark.createDataFrame(
        [("a", 5, 1), ("a", 5, 2), ("a", 5, 3), ("b", 1, 1), ("b", 2, 2)],
        "g string, x long, y long",
    )
    out = {r["g"]: r["pearson_r"] for r in correlation(df, "x", "y", by=["g"]).collect()}
    assert out["a"] is None  # constant x: undefined, NULL
    assert abs(out["b"] - 1.0) < 1e-12  # perfectly correlated group unaffected


def test_admission_replay_mutation_sensitivity(spark, tmp_path):
    """stream_admission_replay's staged-SQL oracle is SENSITIVE to each
    of the two semantics that make sequential MinHash admission what it
    is: (1) candidates ban only against previously ADMITTED documents
    — the store folds survivors, so a rejected near-dup never blocks;
    (2) banded candidacy is a CANDIDATE GENERATOR — rejection requires
    the exact-jaccard verify. The real corpus exercises neither edge
    (no rejected-doc chains, no sub-threshold band collisions that
    would change a decision), which is exactly what this constructed
    fixture closes: the production admit_batch loop matches the true
    oracle on it, and disabling either semantic in the oracle builder
    flips a distinct designed row.

    The texts are search-constructed against the production hash family
    ((2i+1)·h + b mod 4294967311 over md5-32 shingle hashes, 16 hashes
    / 4 bands): its small odd multipliers correlate the per-position
    minimizers with h magnitude, so band collisions only happen when
    one document PRESERVES the exact token spans carrying the other's
    band-minimizer shingles — R keeps B0's band-0 spans (collide,
    j=0.47 ≥ 0.2 → rejected), C copies the contiguous block carrying
    R's unique-shingle band (collide, j(C,R)=0.24, j(C,B0)=0 — admitted
    truly because R was never admitted), and D copies E's band-0 spans
    plus 18 unique tokens (collide at j=0.13 < 0.2 — admitted truly
    because the verify refutes the band hit)."""
    import duckdb as _duckdb

    from fabrix_spark.queries import REGISTRY, _admission_oracle

    B0 = " ".join(f"alpha{i}" for i in range(30))
    E = " ".join(f"echo{i}" for i in range(30))
    R = " ".join(f"rq422m{i}" for i in range(10)) + " " + " ".join(
        f"alpha{i}" for i in range(10, 30)
    )
    C = (
        " ".join(f"rq422m{i}" for i in range(10))
        + " alpha10 "
        + " ".join(f"cf3t{i}" for i in range(10))
    )
    D = " ".join(f"echo{i}" for i in range(13, 21)) + " " + " ".join(
        f"df0b0t{i}" for i in range(18)
    )
    # batches on doc_id % 3: batch0 = {3 (B0), 6 (E)}, batch1 = {1 (R),
    # 4 (D)}, batch2 = {2 (C)}
    rows = [(3, B0, "aa"), (6, E, "aa"), (1, R, "aa"), (4, D, "aa"), (2, C, "aa")]
    fixture = str(tmp_path / "fx")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").coalesce(
        1
    ).write.parquet(fixture + "/documents.parquet")

    got = {r["doc_id"] for r in REGISTRY["stream_admission_replay"].fn(spark, fixture).collect()}

    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{fixture}/documents.parquet/*.parquet'"
    )
    true = {r[0] for r in con.execute(_admission_oracle()).fetchall()}
    assert got == true
    # the decisions the fixture forces: R rejected (near-dup of B0),
    # D and C admitted through the two guarded semantics
    assert true == {3, 6, 4, 2}

    m_scope = {r[0] for r in con.execute(_admission_oracle(scope="all")).fetchall()}
    m_verify = {r[0] for r in con.execute(_admission_oracle(verify=False)).fetchall()}
    assert true ^ m_scope == {2}  # C rejected by the never-admitted R
    assert true ^ m_verify == {4}  # D rejected on the refuted band hit


@pytest.mark.slow
def test_ann_family_excludes_poisoned_vectors(spark):
    """The approximate-ANN entry points share the exact family's
    exclusion contract (NULL vector / NaN component / zero norm):
    pre-fix, ONE NaN component anywhere in the corpus killed every one
    of these ops at the quantizer's ANSI long cast (the projection,
    bucketing, lookup-table and scoring quantizers all evaluate on
    every row feeding their joins — even rows no candidate set ever
    keeps), and one zero-norm vector killed the cosine division."""
    import math

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 1.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),           # zero norm
            (3, [1.0, float("nan"), 2.0, 1.0]),  # NaN component
            (4, None),                            # NULL vector
            (5, [2.0, 1.0, 1.0, 2.0]),
            (7, [1.0, 1.0, 2.0, 0.5]),
            (9, [0.5, 2.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = corpus.filter("vec_id = 1")
    clean = {1, 5, 7, 9}

    assign = similarity.ivf_assign(corpus, corpus.filter("vec_id in (1, 5)")).collect()
    assert {r["vec_id"] for r in assign} == clean

    expr_assign = similarity.ivf_assign_expr(
        corpus, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 1.0, 0.0])]
    ).collect()
    assert {r["vec_id"] for r in expr_assign} == clean

    for out in (
        similarity.rp_topk(corpus, q, k=3, out_dim=4),
        similarity.ivf_cosine_topk(corpus, q, k=3, n_centroids=2, n_probe=2),
        similarity.lsh_cosine_topk(corpus, q, k=3, dim=4),
        similarity.mmr_rerank(corpus, q, k=2, pool=3),
        similarity.pq_cosine_topk(corpus, q, dim=4, m=2, n_codes=2, k=3),
        similarity.ivfpq_topk(corpus, q, dim=4, m=2, n_codes=2, k=3, n_centroids=2),
    ):
        rows = out.collect()
        got = {r["c_id"] for r in rows}
        assert got and got <= clean - {1}, rows

    g = similarity.knn_graph(corpus, k=3, dim=4).collect()
    assert g and {r["src"] for r in g} <= clean and {r["dst"] for r in g} <= clean

    # the numpy triage kernel: NaN components cast to garbage int64
    # INSIDE the kernel (past the isfinite mask), so pre-fix the
    # blocked path silently mis-ranked instead of crashing — it must
    # match its exact twin row for row on the poisoned corpus
    blocked = similarity.cosine_topk_blocked(corpus, q, k=3)
    exact = similarity.cosine_topk(corpus, q, k=3)
    assert sorted(map(tuple, blocked.collect())) == sorted(map(tuple, exact.collect()))

    rows_cb = similarity.pq_train_rows(corpus, dim=4, m=2, n_codes=2)
    assert all(math.isfinite(float(x)) for _, _, vec, _ in rows_cb for x in vec)

    cents = similarity.kmeans_train_rows(corpus, k=2)
    assert len(cents) == 2
    assert all(math.isfinite(x) for _, vec in cents for x in vec)
