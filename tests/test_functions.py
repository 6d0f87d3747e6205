"""Function registry + IVF similarity unit tests (oracle parity for
both is covered by tools/verify_local.py)."""

import pytest
from pyspark.sql import functions as F

from fabrix_spark.functions import FUNCTIONS, apply_fn, fn
from fabrix_spark.operators import similarity


def test_registry_covers_reference_set():
    # the reference's complete function surface (sql_adt.rs:220-246)
    for name in [
        "max", "min", "sum", "avg", "count",
        "abs", "ifnull", "cast", "coalesce", "char_length", "lower", "upper",
    ]:
        assert name in FUNCTIONS


def test_registry_families_present():
    for name in [
        "regexp_extract", "date_trunc", "array_contains", "get_json_object",
        "approx_count_distinct", "percentile_approx", "zip_with",
    ]:
        assert name in FUNCTIONS


def test_fn_unknown_hints():
    with pytest.raises(ValueError, match="did you mean"):
        fn("regex_extract")


def test_apply_fn(spark):
    df = spark.createDataFrame([(1, "ab"), (2, None)], "id int, s string")
    out = df.select(
        apply_fn("ifnull", F.col("s"), "?").alias("s2"),
        apply_fn("char_length", F.coalesce(F.col("s"), F.lit(""))).alias("n"),
    ).collect()
    assert [r["s2"] for r in out] == ["ab", "?"]


def test_ivf_topk_shape_and_determinism(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    out = similarity.ivf_cosine_topk(emb, q, k=3, n_centroids=8, n_probe=2)
    rows = out.collect()
    assert {r["q_id"] for r in rows} == {0, 1, 2, 3}
    assert all(1 <= r["rank"] <= 3 for r in rows)
    # deterministic across runs
    again = similarity.ivf_cosine_topk(emb, q, k=3, n_centroids=8, n_probe=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_lsh_recall_vs_bruteforce(spark):
    """Approximate LSH top-k must recover a reasonable share of the
    exact neighbors at small n_planes (big buckets → high recall)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["q_id"], r["c_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in similarity.lsh_cosine_topk(emb, q, k=5, n_planes=3, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall collapsed: {recall}"


def test_mod_keeps_dividend_sign_pmod_is_positive(spark):
    """SQL MOD(-7, 3) = -1 (dividend's sign); pmod(-7, 3) = 2. The
    registry aliased "mod" to pmod, silently flipping negatives."""
    df = spark.range(1)
    r = df.select(
        apply_fn("mod", F.lit(-7), F.lit(3)).alias("m"),
        apply_fn("pmod", F.lit(-7), F.lit(3)).alias("p"),
        apply_fn("mod", F.lit(7), F.lit(3)).alias("mp"),
    ).first()
    assert r["m"] == -1
    assert r["p"] == 2
    assert r["mp"] == 1
