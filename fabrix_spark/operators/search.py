"""Inverted text index: persisted posting lists + index-accelerated
keyword search.

A full-text containment query (`docs whose text has ALL these terms`)
over a 100 TB corpus cannot afford a scan-and-regex pass per query.
The standard shape is an inverted index: one (token, doc_id) posting
table, built once (one explode + distinct — the same exploded-token
pass the TF-IDF/rarity operators already make), persisted CLUSTERED BY
token so the lake's min/max file statistics turn any term lookup into
file-pruned reads (sources/lake.py data skipping — the parquet
analogue of a posting-list seek).

Search is then: broadcast the (tiny) term list, semi-join the posting
table on token — file-pruned to the terms' byte ranges — and keep docs
matching ALL terms via a per-doc distinct-term count. One broadcast
join + one aggregate shuffle on doc_id, both proportional to the
POSTINGS OF THE QUERY TERMS, never the corpus.

Tokenization is deliberately the trivial lowercase-whitespace split so
an external engine can reproduce it exactly (the oracle's LIKE-free
twin); swap in `text.normalize`/BPE upstream for linguistic fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread

__all__ = ["build_token_index", "search_all_terms", "search_any_terms"]


def tokens_expr(text_col: str):
    """The index's tokenization (lowercase, split on whitespace runs,
    empties dropped) — exposed so oracles/tests reproduce it."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def build_token_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (token, doc_id) posting pairs. One projection + explode
    + per-doc distinct; sized by total tokens, shuffle-free until the
    caller repartitions/sorts for persistence. Persist with
    ``LakeTable.save`` after ``repartitionByRange("token")`` +
    ``sortWithinPartitions("token")`` (or ``optimize(cluster_by=
    ["token"])``) so every file's manifest carries a tight token
    min/max — term lookups then read only the files whose range covers
    the term."""
    return (
        spread(docs)
        .select(F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"))
    )


def _terms_df(index: DataFrame, terms: list[str]) -> DataFrame:
    if not terms:
        raise ValueError("search needs at least one term")
    return index.sparkSession.createDataFrame(
        [(t.lower(),) for t in terms], "token string"
    )


def search_all_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Doc ids containing ALL ``terms`` (conjunctive / AND search).
    Broadcast the term list, semi-join postings, keep docs whose
    distinct matched-term count equals ``len(terms)``. Work ∝ postings
    of the query terms."""
    uniq = sorted({t.lower() for t in terms})
    hits = index.join(F.broadcast(_terms_df(index, uniq)), "token")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("token").alias("__matched"))
        .filter(F.col("__matched") == len(uniq))
        .select(id_col)
    )


def search_any_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Doc ids containing AT LEAST ONE term (disjunctive / OR search),
    with the per-doc matched-term count for ranking."""
    uniq = sorted({t.lower() for t in terms})
    hits = index.join(F.broadcast(_terms_df(index, uniq)), "token")
    return hits.groupBy(id_col).agg(F.count_distinct("token").alias("n_terms"))
