"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join handling (enabled in ``session.py``) splits oversized
sort-merge partitions at runtime and is the first line of defense.
Salting is the explicit fallback for *catastrophic* skew — a handful
of keys holding a large share of all rows — or engines/queries where
AQE cannot kick in (e.g. the skewed side feeds an aggregation first).

``salted_join`` spreads each left key over ``salt`` shuffle partitions
and replicates the right side ``salt`` times, so no single task owns a
hot key's full row set. Correct for inner/left joins on equi-keys;
results are identical to the plain join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "top_keys"]

_SALT = "__fx_salt__"


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Key-frequency profile — find the hot keys before deciding to
    salt (one partial-aggregated shuffle)."""
    return df.groupBy(key).count().orderBy(F.desc("count")).limit(n)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated ``salt``× (broadcast-sized rights stay cheap; for two
    huge skewed sides, prefer AQE or pre-bucketing).

    The salt is derived from a hash of the whole left row, so rows of
    one hot key scatter uniformly without needing a random generator
    (deterministic plan, reproducible results)."""
    if how not in ("inner", "left"):
        raise ValueError("salting preserves semantics for inner/left equi-joins only")
    keys = [on] if isinstance(on, str) else list(on)

    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn(_SALT, lsalt)
    r = right.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l.join(r, keys + [_SALT], how)
    return out.drop(_SALT)
