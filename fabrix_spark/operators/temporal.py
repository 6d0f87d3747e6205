"""Temporal joins Spark lacks as primitives: as-of join and bounded
interval (range) join.

Absent in the reference too (SURVEY.md §2.11 — its algebra is
equi-join only, sql_adt.rs:679-736); both are standard time-series /
feature-store operations, built here from shuffle-aware compositions:

- **as-of**: union both sides, one window pass per key ordered by
  time carrying the last right-side row forward. One shuffle on the
  key — never a range-condition join, which Spark would execute as a
  broadcast-nested-loop at scale.
- **interval**: time-bucket equi-join — explode each left row to the
  buckets its window can touch, equi-join on (key, bucket), then
  filter exactly. Shuffle is on (key, bucket); the quadratic blowup is
  bounded per bucket instead of per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "asof_join",
    "interval_join",
    "resample_ffill",
    "resample_interpolate",
    "rolling_zscore",
    "ewma_decayed",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the right row nearest in time
    (matching ``by`` keys when given), per ``direction`` — the full
    pandas ``merge_asof`` direction surface:

    - ``backward`` (default): most recent right row with
      ``right[on] <= left[on]``;
    - ``forward``: earliest right row with ``right[on] >= left[on]``;
    - ``nearest``: whichever of the two is closer in ABSOLUTE time
      (exact microsecond arithmetic); equidistant ties take the
      backward row (deterministic, and what feature-store semantics
      want — never read the future when the past is equally close).

    Implementation: tag + union + ``last/first(..., ignorenulls)``
    windows over one (by, time) sort, then keep left rows. One shuffle
    on the by keys regardless of direction; both inputs stream through
    a single sort — the classic scalable as-of (no range join, no
    per-row lookups). ``tolerance_seconds`` bounds the |Δt| of the
    chosen row (microsecond-exact comparison).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    # right columns that collide with left names come back prefixed —
    # without this, the left rows' own values would pollute the
    # carry-forward chain (and the output would be ambiguous)
    out_names = {c: (f"r_{c}" if c in left.columns else c) for c in right_cols}

    # all right attributes travel in ONE struct so the whole right row
    # fills forward atomically: filling each column independently
    # could stitch together fields from different right rows whenever
    # the most recent row holds a NULL attribute
    rt = right.select(
        *by,
        F.col(on),
        F.struct(F.col(on).alias("__rt_time"), *[F.col(c) for c in right_cols]).alias("__r"),
    ).withColumn("__side", F.lit(0))
    struct_t = rt.schema["__r"].dataType
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(struct_t)
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = lt.columns
    u = lt.select(*cols).unionByName(rt.select(*cols))

    # right rows sort before left rows at the same timestamp (side 0
    # first ascending) so a same-instant right row is visible both to
    # the backward frame (<=) and, with side DESC in the forward sort,
    # to the forward frame (>=)
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward fill is "first non-null at-or-after" — but a
    # (currentRow, unboundedFollowing) frame is QUADRATIC in Spark
    # (UnboundedFollowingWindowFunctionFrame re-aggregates the whole
    # tail for every row; measured 97-101 s vs the backward pass's
    # ~2 s on the same data, r17). Running it as last(...) over the
    # EXACTLY-REVERSED total order — (on DESC, side ASC) reverses
    # (on ASC, side DESC) — keeps the frame at
    # (unboundedPreceding, currentRow), which Spark evaluates
    # incrementally in one pass. Same frame membership row-for-row,
    # so results are identical wherever the (on, side) sort is unique
    # per key (right rows are unique per (by, on) for every caller;
    # exact ties were already resolved arbitrarily before).
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("__r", ignorenulls=True).over(w_back).alias("__rb"))
    if direction in ("forward", "nearest"):
        fills.append(F.last("__r", ignorenulls=True).over(w_fwd).alias("__rf_fwd"))
    filled = u.select(
        *[c for c in cols if c not in ("__side", "__r")],
        F.col("__side"),
        *fills,
    )
    out = filled.filter(F.col("__side") == 1)
    t_us = F.unix_micros(F.col(on).cast("timestamp"))
    if direction == "backward":
        chosen = F.col("__rb")
    elif direction == "forward":
        chosen = F.col("__rf_fwd")
    else:
        db = t_us - F.unix_micros(F.col("__rb.__rt_time").cast("timestamp"))
        df_ = F.unix_micros(F.col("__rf_fwd.__rt_time").cast("timestamp")) - t_us
        # choose-nearest-then-tolerance-gate IS pandas merge_asof's
        # candidates-within-tolerance semantics (checked r17): with one
        # symmetric tolerance, "nearest out of tolerance but the other
        # side within" is impossible — the farther distance being
        # within implies the nearer one is too — so gating the chosen
        # row below is equivalent to gating the candidate set here.
        chosen = (
            F.when(F.col("__rb").isNull(), F.col("__rf_fwd"))
            .when(F.col("__rf_fwd").isNull(), F.col("__rb"))
            .when(db <= df_, F.col("__rb"))
            .otherwise(F.col("__rf_fwd"))
        )
    out = out.withColumn("__rf", chosen)
    asof_time = F.col("__rf.__rt_time")
    if tolerance_seconds is not None:
        within = asof_time.isNotNull() & (
            F.abs(t_us - F.unix_micros(asof_time.cast("timestamp")))
            <= tolerance_seconds * 1_000_000
        )
        picks = [
            F.when(within, F.col(f"__rf.{c}")).alias(out_names[c]) for c in right_cols
        ]
    else:
        picks = [F.col(f"__rf.{c}").alias(out_names[c]) for c in right_cols]
    return out.select(*left.columns, *picks)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    low: Column,
    high: Column,
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    right_on: str | None = None,
) -> DataFrame:
    """Pairs (left, right) where ``low <= right[right_on] <= high``
    (bounds are Columns over the left row) and ``by`` keys match.

    The naive formulation is a range-condition join Spark plans as a
    nested loop; instead each left row explodes to every time bucket
    its interval [low, high] overlaps, the join is an equi-join on
    (by..., bucket), and the exact range predicate filters after —
    bucketing uses truncated epoch seconds (consistently on both
    sides, so coverage is exact) while the final comparison keeps full
    timestamp precision. Right columns are prefixed ``r_`` on clash."""
    by = by or []
    right_on = right_on or on
    bucket = F.lit(bucket_seconds)

    l = left.withColumn("__lo", low).withColumn("__hi", high)
    l = l.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("__lo") / bucket),
                F.floor(F.unix_timestamp("__hi") / bucket),
            )
        ),
    )
    r = right.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(right_on)) / bucket))

    clash = [c for c in right.columns if c in left.columns]
    for c in clash:
        r = r.withColumnRenamed(c, f"r_{c}")
    rby = [f"r_{k}" if k in clash else k for k in by]
    r_on_col = f"r_{right_on}" if right_on in clash else right_on

    cond = l["__bucket"] == r["__bucket"]
    for lk, rk in zip(by, rby):
        cond = cond & (l[lk] == r[rk])
    joined = l.join(r, cond).filter(
        (F.col(r_on_col) >= F.col("__lo")) & (F.col(r_on_col) <= F.col("__hi"))
    )
    return joined.drop("__lo", "__hi").drop(l["__bucket"]).drop(r["__bucket"]).drop(*rby)


def resample_ffill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Resample each key's irregular observations onto a regular
    ``unit`` grid (hour/day/...) with forward fill — the
    time-series-regularization step before windowed features or
    charting. Per key the grid spans floor(min ts) .. floor(max ts);
    the value at each grid instant is the most recent observation at
    or before it (NULL before the first observation).

    Plan: one tiny per-key bounds aggregate → sequence/explode grid
    (map-side) → union with observations → ONE window pass
    (last non-null over rows-preceding frame). Everything partitions
    by key; no self-join, no driver loop. Ordering is made fully
    deterministic — (ts, grid-after-observation, value NULLS FIRST) —
    so ties resolve identically on any engine and the result
    hash-verifies.

    Returns (key_col, grid_ts, value_col)."""
    k, ts, v = F.col(key_col), F.col(ts_col), F.col(value_col)
    ts_type = df.schema[ts_col].dataType
    # date_trunc returns a tz-aware timestamp even over NTZ input —
    # cast grid instants back to the INPUT's timestamp type so the
    # union and the output stay type-stable
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts)).cast(ts_type).alias("__t0"),
        F.date_trunc(unit, F.max(ts)).cast(ts_type).alias("__t1"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"interval 1 {unit}"))
        ).alias(ts_col),
    ).select(
        key_col,
        F.col(ts_col).cast(ts_type).alias(ts_col),
        F.lit(None).cast("double").alias(value_col),
        F.lit(1).alias("__grid"),
    )
    # NULL-timestamp rows are dropped (r17 self-review): they sort
    # before every grid instant, so a phantom observation with no
    # place on the time axis seeded the carry-forward chain and filled
    # grid points BEFORE the key's first real observation
    obs = (
        df.filter(ts.isNotNull())
        .select(key_col, ts_col, v.cast("double").alias(value_col))
        .withColumn("__grid", F.lit(0))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts.asc(), F.col("__grid").asc(), v.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = obs.unionByName(grid).withColumn(
        "__filled", F.last(value_col, ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__grid") == 1)
        .select(k, ts.alias("grid_ts"), F.col("__filled").alias(value_col))
    )


def resample_interpolate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Resample each key's irregular observations onto a regular
    ``unit`` grid with LINEAR interpolation between the bracketing
    observations — the gap-fill step for charting/feature grids where
    forward fill (:func:`resample_ffill`) would bias values stale.

    Semantics: at each grid instant ``t`` in floor(min ts)..floor(max
    ts), the value is the exact observation when one exists at ``t``
    (no float ops), NULL before the first / after the last observation
    (extrapolation is a policy choice — compose with ffill if wanted),
    otherwise ``v0 + (v1 − v0) · (t − t0)/(t1 − t0)`` from the nearest
    observations around ``t``. NULL-valued observations are dropped
    (nothing to interpolate through), and coincident observations at
    one (key, ts) are collapsed with ``max`` (order-free, so results
    are engine-deterministic; float ``avg`` would be summation-order
    dependent). Time deltas use integer epoch-MICROseconds — full
    timestamp precision, so two distinct bracketing observations can
    never collapse to a zero denominator (at ms precision a pair
    straddling a grid instant inside one millisecond would divide
    0/0) — and the one division is the only float op, so the result
    hash-verifies against any ANSI engine.

    Plan (same scale shape as resample_ffill): per-key bounds
    aggregate → sequence/explode grid → union with the deduplicated
    observations → TWO window passes over the same (key, ts)
    partitioning (last-before carrying (v0, t0) forward, first-after
    carrying (v1, t1) backward) — one shuffle on the key total, no
    self-join, no range join, no driver loop.

    Returns (key_col, grid_ts, value_col)."""
    k, ts = F.col(key_col), F.col(ts_col)
    ts_type = df.schema[ts_col].dataType
    # NaN observations are dropped like NULL ones (r17 self-review):
    # NaN is GREATEST in Spark's total order, so the coincident-
    # observation max() silently preferred a NaN over a real value at
    # the same instant — and there is nothing to interpolate through a
    # NaN anyway. NULL-timestamp rows are likewise dropped: they sort
    # before every grid instant and would seed the carry-forward chain
    # with a value that has no place on the time axis.
    vd = F.col(value_col).cast("double")
    obs = (
        df.filter(vd.isNotNull() & ~F.isnan(vd) & ts.isNotNull())
        .groupBy(key_col, ts_col)
        .agg(F.max(vd).alias(value_col))
        .withColumn("__grid", F.lit(0))
    )
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts)).cast(ts_type).alias("__t0"),
        F.date_trunc(unit, F.max(ts)).cast(ts_type).alias("__t1"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"interval 1 {unit}"))
        ).alias(ts_col),
    ).select(
        key_col,
        F.col(ts_col).cast(ts_type).alias(ts_col),
        F.lit(None).cast("double").alias(value_col),
        F.lit(1).alias("__grid"),
    )
    # observation sorts BEFORE a coincident grid instant, so the
    # backward (at-or-before) pass sees it; the forward pass then
    # starts past it, but t == t0 short-circuits to the exact value
    order = [ts.asc(), F.col("__grid").asc()]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "__next" is first-non-null-at-or-after, evaluated as a RUNNING
    # last() over the exactly-reversed sort order — (ts DESC,
    # __grid DESC) reverses (ts ASC, __grid ASC) — because a
    # (currentRow, unboundedFollowing) frame re-aggregates the whole
    # tail per row in Spark (quadratic per key; see asof_join). The
    # (key, ts, __grid) sort is unique (obs and grid are both grouped
    # per (key, ts)), so the reversal is result-identical. Costs one
    # extra Sort node over the union (the two fills no longer share an
    # ordering) — linear, and the window pass itself becomes linear.
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(ts.desc(), F.col("__grid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pair = F.when(
        F.col("__grid") == 0,
        F.struct(F.col(value_col).alias("v"), F.unix_micros(ts).alias("t")),
    )
    both = (
        obs.unionByName(grid)
        .withColumn("__prev", F.last(pair, ignorenulls=True).over(w_prev))
        .withColumn("__next", F.last(pair, ignorenulls=True).over(w_next))
    )
    t_us = F.unix_micros(ts)
    v0, t0_us = F.col("__prev.v"), F.col("__prev.t")
    v1, t1_us = F.col("__next.v"), F.col("__next.t")
    interp = (
        F.when(F.col("__prev").isNull(), F.lit(None).cast("double"))
        .when(t_us == t0_us, v0)
        .when(F.col("__next").isNull(), F.lit(None).cast("double"))
        .otherwise(
            v0
            + (v1 - v0)
            * ((t_us - t0_us).cast("double") / (t1_us - t0_us).cast("double"))
        )
    )
    return (
        both.filter(F.col("__grid") == 1)
        .select(k, ts.alias("grid_ts"), interp.alias(value_col))
    )


def rolling_zscore(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    order_tiebreak: str | None = None,
    window_rows: int = 10,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Per-key rolling z-score — the streaming-friendly anomaly
    detector (is this observation far from its own recent history?).

    Each observation scores against the ``window_rows`` observations
    STRICTLY BEFORE it (ROWS window_rows PRECEDING .. 1 PRECEDING) —
    the point under test must not inflate its own baseline: a
    self-inclusive window bounds |z| at sqrt(n-1), which silently
    caps a 10-row window at 3 sigma and makes thresholds above that
    unreachable.

    Determinism contract (the hard part of oracling ANY variance):
    the rolling count/sum/sum-of-squares are computed over the value
    QUANTIZED to int64 (exact, order-free integers), and mean/std
    derive from those exact moments in a fixed double-op sequence —
    identical on every engine and partitioning, so even the z-score
    doubles hash-match. A naive sum of doubles would drift in the last
    ulp per accumulation order.

    One window pass, ordered by (ts, tiebreak) so frames are
    unambiguous. Rows with fewer than 2 baseline observations, or a
    zero-variance baseline, get z = NULL. Returns the input keys +
    (n = baseline size, z).

    NaN values quantize to NULL (r17 self-review): they occupy a
    window SLOT but contribute nothing to the moments — exactly the
    streaming twin's contract (stateful_rolling_zscore treats NaN as
    null), where the unguarded ANSI long cast of round(NaN) previously
    killed the batch job on the first NaN and broke twin parity."""
    vd = F.col(value_col).cast("double")
    q = F.when(~F.isnan(vd), F.round(vd * quantize).cast("long"))
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    # q*q in decimal(38,0), not int64: |q| past ~3.04e9 (|value| past
    # ~3037 at the default quantize) squares beyond int64 — ANSI mode
    # would fail the job, non-ANSI would silently wrap — while the
    # streaming twin's Python-int moments stay exact. The decimal
    # product is exact for any int64 q, so in-range values are
    # bit-identical to before (r16 self-review).
    qd = F.col("__q").cast("decimal(19,0)")
    with_m = (
        df.withColumn("__q", q)
        .withColumn("__n", F.count("__q").over(w))
        .withColumn("__s", F.sum("__q").over(w))
        .withColumn("__ss", F.sum(qd * qd).over(w))
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (ss - s * s / n) / n
    z = (F.col("__q").cast("double") - s / n) / F.sqrt(var)
    return with_m.select(
        key_col,
        ts_col,
        value_col,
        F.col("__n").alias("n"),
        F.when((F.col("__n") > 1) & (var > 0), z).alias("z"),
    )


def ewma_decayed(
    df: DataFrame,
    by: str,
    on: str,
    value_cents: "Column | str",
    tie_col: str | None = None,
    window: int = 8,
    decay_num: int = 9,
    decay_den: int = 10,
) -> DataFrame:
    """Exponentially-decayed moving average — the classic decayed
    feature (recent behavior weighted ~decay^lag) — in EXACT integer
    arithmetic so it reproduces bit-for-bit on any engine.

    True EWMA is an infinite recursion whose float accumulation order
    differs per engine; the standard production form is the truncated
    window instead: over the last ``window`` observations per ``by``
    key, weight lag j by ``decay^j``. With decay = num/den rational,
    multiply through by ``den^(window-1)``: weight_j = num^j *
    den^(window-1-j) — all int64 (bounded: 9^7·10^0 ≈ 4.8e6 times
    cent values), summed exactly; the single final int/int division is
    IEEE-identical everywhere. Lags come from ``lag()`` windows
    partitioned by the key — one shuffle on ``by``; rows with fewer
    than ``window`` priors renormalize over the weights present
    (standard adjusted EWMA).

    Returns df columns + ``ewma_cents`` (double).

    Overflow contract: the weighted sum accumulates as int64, so
    ``window · |value| · max(num, den)^(window-1)`` must stay below
    2^63. With the defaults (9/10, window 8) that allows |value| up to
    ~10^11; the constructor REFUSES configurations whose headroom
    drops below ±10^7 (typical cent magnitudes) rather than silently
    wrapping — widen ``window`` only with a smaller decay base."""
    max_weight = max(decay_num, decay_den) ** (window - 1)
    if window * max_weight > (1 << 63) // 10**7:
        raise ValueError(
            f"ewma_decayed: window={window} with decay {decay_num}/{decay_den} "
            f"leaves int64 headroom below ±1e7 per value "
            f"(window·base^(window-1) = {window * max_weight:.3g}); "
            "shrink the window or the decay base"
        )
    v = F.col(value_cents) if isinstance(value_cents, str) else value_cents
    order = [F.col(on).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(by).orderBy(*order)
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(window):
        weight = (decay_num**j) * (decay_den ** (window - 1 - j))
        lagged = F.lag(v.cast("long"), j).over(w)
        num = num + F.coalesce(lagged * weight, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return df.withColumn("ewma_cents", num.cast("double") / den)
