"""as-of / interval join unit tests (oracle parity via verify_local)."""

import datetime as dt

from pyspark.sql import functions as F

from fabrix_spark.operators.temporal import asof_join, interval_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10, 5)), (2, _ts(10, 35)), (3, _ts(9, 0))],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(_ts(10, 0), 100.0), (_ts(10, 30), 200.0)], "ts timestamp, px double"
    )
    out = {r["id"]: r["px"] for r in asof_join(left, right, on="ts").collect()}
    # 10:05 → 10:00 rate; 10:35 → 10:30; 09:00 → nothing (null)
    assert out == {1: 100.0, 2: 200.0, 3: None}


def test_asof_same_instant_and_keys(spark):
    left = spark.createDataFrame(
        [("a", 1, _ts(10, 0)), ("b", 2, _ts(10, 0))], "k string, id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(10, 0), 1.0), ("b", _ts(9, 0), 2.0)], "k string, ts timestamp, v double"
    )
    out = {r["id"]: r["v"] for r in asof_join(left, right, on="ts", by=["k"]).collect()}
    # same-instant right row is visible (<=); keys don't bleed
    assert out == {1: 1.0, 2: 2.0}


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(12, 0))], "id long, ts timestamp")
    right = spark.createDataFrame([(_ts(10, 0), 5.0)], "ts timestamp, v double")
    with_tol = asof_join(left, right, on="ts", tolerance_seconds=1800).collect()
    assert with_tol[0]["v"] is None  # 2h old > 30min tolerance
    no_tol = asof_join(left, right, on="ts").collect()
    assert no_tol[0]["v"] == 5.0


def test_interval_join_buckets(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10, 0))], "id long, user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 7, _ts(10, 4)), (11, 7, _ts(10, 6)), (12, 8, _ts(10, 2)), (13, 7, _ts(9, 59))],
        "id long, user long, ts timestamp",
    )
    out = interval_join(
        left,
        right,
        on="ts",
        low=F.col("ts"),
        high=F.col("ts") + F.expr("INTERVAL 5 MINUTES"),
        by=["user"],
        bucket_seconds=120,  # several buckets inside the window
    )
    got = sorted(r["r_id"] for r in out.collect())
    # 10:04 in range; 10:06 outside; user 8 excluded; 9:59 before
    assert got == [10]


def test_asof_fills_whole_right_row(spark):
    """The right row must carry forward ATOMICALLY: a NULL attribute
    in the latest right row stays NULL instead of backfilling from an
    older row (per-column fill would stitch rows together)."""
    left = spark.createDataFrame([(1, _ts(12, 0))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(_ts(10, 0), 5.0, 50.0), (_ts(11, 0), 7.0, None)],
        "ts timestamp, a double, b double",
    )
    row = asof_join(left, right, on="ts").collect()[0]
    assert row["a"] == 7.0
    assert row["b"] is None  # NOT 50.0 from the older row


def test_asof_prefixes_colliding_right_columns(spark):
    left = spark.createDataFrame([(1, _ts(12, 0), 9.0)], "id long, ts timestamp, v double")
    right = spark.createDataFrame([(_ts(10, 0), 5.0)], "ts timestamp, v double")
    row = asof_join(left, right, on="ts", right_cols=["v"]).collect()[0]
    assert row["v"] == 9.0  # left's own column intact
    assert row["r_v"] == 5.0  # right value arrives prefixed


def test_resample_ffill_model(spark):
    from fabrix_spark.operators.temporal import resample_ffill

    rows = [
        (1, "2024-01-01 00:10:00", 1.0),
        (1, "2024-01-01 02:30:00", 2.0),
        (2, "2024-01-01 05:59:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {
        (r["user_id"], str(r["grid_ts"])): r["value"]
        for r in resample_ffill(df).collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): None,   # grid before first obs
        (1, "2024-01-01 01:00:00"): 1.0,    # carried forward
        (1, "2024-01-01 02:00:00"): 1.0,    # 02:30 obs is after 02:00
        (2, "2024-01-01 05:00:00"): None,   # single-hour span, obs later
    }


def test_rolling_zscore_model(spark):
    from fabrix_spark.operators.temporal import rolling_zscore

    # 9 calm observations then a spike: the spike's z must be large
    rows = [(1, f"2024-01-01 00:0{i}:00", float(10 + (i % 2))) for i in range(9)]
    rows.append((1, "2024-01-01 00:09:00", 100.0))
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = sorted(rolling_zscore(df, window_rows=10).collect(), key=lambda r: str(r["ts"]))
    assert out[0]["z"] is None          # empty baseline
    assert out[1]["z"] is None          # one-point baseline: no variance
    assert abs(out[2]["z"]) > 0         # two-point baseline: defined
    assert out[-1]["z"] > 50            # the spike vs its CALM history
    assert out[-1]["n"] == 9            # baseline excludes the spike itself
    # exact-moment determinism: identical under repartitioning
    again = sorted(
        rolling_zscore(df.repartition(5), window_rows=10).collect(),
        key=lambda r: str(r["ts"]),
    )
    assert [r["z"] for r in again] == [r["z"] for r in out]


def test_asof_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [(1, _ts(10, 5)), (2, _ts(10, 29)), (3, _ts(10, 31)), (4, _ts(11, 0))],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(_ts(10, 0), 100.0), (_ts(10, 30), 200.0)], "ts timestamp, px double"
    )
    fwd = {r["id"]: r["px"] for r in asof_join(left, right, on="ts", direction="forward").collect()}
    # forward: earliest right at-or-after; 11:00 has none
    assert fwd == {1: 200.0, 2: 200.0, 3: None, 4: None}
    near = {r["id"]: r["px"] for r in asof_join(left, right, on="ts", direction="nearest").collect()}
    # 10:05 closer to 10:00; 10:29 closer to 10:30; 10:31 closer to
    # 10:30; 11:00 only has backward
    assert near == {1: 100.0, 2: 200.0, 3: 200.0, 4: 200.0}


def test_asof_nearest_tie_takes_backward(spark):
    left = spark.createDataFrame([(1, _ts(10, 15))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(_ts(10, 0), 1.0), (_ts(10, 30), 2.0)], "ts timestamp, px double"
    )
    out = asof_join(left, right, on="ts", direction="nearest").collect()
    assert out[0]["px"] == 1.0  # equidistant → backward (never read the future)


def test_asof_forward_same_instant_visible(spark):
    left = spark.createDataFrame([(1, _ts(10, 0))], "id long, ts timestamp")
    right = spark.createDataFrame([(_ts(10, 0), 7.0)], "ts timestamp, px double")
    out = asof_join(left, right, on="ts", direction="forward").collect()
    assert out[0]["px"] == 7.0  # >= includes the same instant


def test_asof_nearest_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(12, 0))], "id long, ts timestamp")
    right = spark.createDataFrame([(_ts(10, 0), 5.0)], "ts timestamp, v double")
    out = asof_join(left, right, on="ts", direction="nearest", tolerance_seconds=1800).collect()
    assert out[0]["v"] is None  # nearest row is 2h away > 30min


def test_temporal_nan_and_null_ts_contracts(spark):
    """r17 self-review pins: (a) rolling_zscore quantizes NaN to NULL
    — a window slot with no moment contribution, the streaming twin's
    exact contract — instead of dying at the ANSI long cast of
    round(NaN); (b) resample_interpolate drops NaN observations (NaN
    is greatest in Spark's total order, so the coincident-observation
    max() silently preferred NaN over a real value at the same
    instant); (c) both resamplers drop NULL-timestamp rows, which
    sorted before every grid instant and filled grid points BEFORE
    the key's first real observation."""
    from datetime import datetime, timedelta

    from fabrix_spark.operators.temporal import (
        resample_ffill,
        resample_interpolate,
        rolling_zscore,
    )

    base = datetime(2024, 1, 1)
    dt = lambda m: base + timedelta(minutes=m)  # noqa: E731

    df = spark.createDataFrame(
        [(1, dt(i), float(v)) for i, v in enumerate([10, 11, 10, 11, 10, 11])]
        + [(1, dt(6), float("nan")), (1, dt(7), 999.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = rolling_zscore(df, window_rows=4).orderBy("ts").collect()
    assert rows[-2]["z"] is None  # the NaN row itself scores NULL
    # next row's baseline: slot occupied, moments from the 3 real values
    assert rows[-1]["n"] == 3 and rows[-1]["z"] is not None

    df2 = spark.createDataFrame(
        [(1, dt(0), 1.0), (1, dt(60), 5.0), (1, dt(60), float("nan"))],
        "user_id long, ts timestamp, value double",
    )
    got = {str(r["grid_ts"]): r["value"] for r in resample_interpolate(df2).collect()}
    assert got["2024-01-01 01:00:00"] == 5.0  # real value wins over NaN

    df3 = spark.createDataFrame(
        [(1, None, 42.0), (1, dt(90), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    got = [r["value"] for r in resample_ffill(df3).collect()]
    assert got == [None]  # no phantom fill before the first real obs


def test_asof_nearest_tolerance_picks_in_tolerance_nearest(spark):
    """nearest + tolerance (r17 sweep note): the chosen row is the
    nearest candidate WITHIN tolerance — equivalent to pandas
    merge_asof's candidate gating, because with one symmetric
    tolerance the farther side being within implies the nearer side
    is too (so choose-then-gate == gate-then-choose; verified while
    hunting a suspected divergence that turned out unreachable)."""
    from datetime import datetime

    from fabrix_spark.operators.temporal import asof_join

    _ts = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame([(1, _ts(12, 0))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(_ts(11, 10), 1.0), (_ts(12, 40), 2.0)], "ts timestamp, px double"
    )
    # backward 50 min away, forward 40 min away
    out = asof_join(left, right, on="ts", direction="nearest", tolerance_seconds=45 * 60).collect()
    assert out[0]["px"] == 2.0  # forward: nearest and within 45 min
    out = asof_join(left, right, on="ts", direction="nearest", tolerance_seconds=35 * 60).collect()
    assert out[0]["px"] is None  # neither candidate within 35 min
    out = asof_join(left, right, on="ts", direction="nearest").collect()
    assert out[0]["px"] == 2.0  # no tolerance: nearest overall
