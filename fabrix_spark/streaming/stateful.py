"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming at all (SURVEY.md §2.7); these
are the idiomatic Spark extension: per-key state stored in the state
store, Arrow-batched pandas on the executors, watermark-driven
timeouts. State is partitioned by key — the shuffle is one
hash-exchange on the grouping key and state never concentrates on the
driver, so the operator scales with executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals", "stateful_sessionize", "stateful_rolling_zscore"]


def _quantize_half_up(v: float, quantize: int) -> int:
    """HALF_UP integer quantization matching Spark's ``F.round``
    (used by the batch twin ``operators.temporal.rolling_zscore``).
    ``F.round`` is decimal HALF_UP over the double's SHORTEST REPR
    (``BigDecimal.valueOf``), so we delegate to the exact twin
    ``operators.similarity._round_half_up`` — a naive binary
    ``floor(x + 0.5)`` diverges on repr-tie values like
    0.49999999999999994, and Python's built-in ``round()`` is
    half-to-even; either would break the stream==batch replay
    contract."""
    from fabrix_spark.operators.similarity import _round_half_up

    return _round_half_up(v * quantize)


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Cumulative per-key count/sum maintained across micro-batches —
    the minimal custom stateful aggregate. Emits the updated totals for
    every key seen in each batch (output mode: update)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, stream.schema[key_col].dataType),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    _mutate: str | None = None,
) -> DataFrame:
    """Gap-based sessionization with explicit state: a session closes
    when the event-time watermark passes last_seen + gap, then the
    finished session (start, end, n_events) is emitted exactly once.

    This is the hand-rolled equivalent of ``session_window`` — kept as
    the template for stateful logic session_window cannot express
    (e.g. carrying custom per-session aggregates).

    LATE-DATA CONTRACT: events whose time is older than the current
    watermark are DROPPED (same as the built-in ``session_window``
    aggregation). ``applyInPandasWithState`` does NOT filter late
    input itself — the watermark only drives timeouts — so without the
    explicit filter a late event would merge into (or, worse, reopen
    after flush as a phantom fragment of) a session the watermark
    already promised was final. Pinned by
    ``test_stateful_sessionize_drops_event_older_than_watermark``.

    OUT-OF-ORDER CONTRACT (r16 rewrite, found by self-review): events
    newer than the watermark may arrive in ANY order across
    micro-batches, so per-key state is a LIST of open sessions, not a
    single (start, last) pair — an in-watermark straggler can extend a
    session BACKWARD, open an earlier separate session, or BRIDGE two
    open sessions into one (the previous single-session fold silently
    folded such events forward, corrupting session_start or losing a
    session). Each batch interval-merges (session ∪ event) items
    sorted by start; a session is emitted — exactly once — only when
    ``watermark > session_end + gap``, i.e. when no admissible future
    event (t ≥ watermark) can still merge with it (merge window is
    [start − gap, end + gap]); the old inline gap-close emitted as
    soon as a LATER event arrived in the same batch, which finalized
    sessions the watermark had not yet sealed. Open sessions per key
    are bounded by watermark_delay / gap + 1 (they are > gap apart and
    all end after watermark − gap), so state stays small.

    ``_mutate`` is MUTATION-EVIDENCE plumbing, not API (same device as
    queries._fuzzy_update_oracle's parameterization): each value
    disables exactly one of the r16 out-of-order semantics so the
    staged oracle's sensitivity test can assert the output flips per
    semantic — ``"no_backward"`` (a straggler never moves an existing
    session's start earlier), ``"no_bridge"`` (two open sessions never
    merge, even when a straggler lands between them), ``"eager_seal"``
    (every session but the newest is emitted as soon as the batch
    folds, the pre-r16 inline gap-close, instead of waiting for
    watermark > end + gap). Production callers leave it ``None``."""
    gap_ms = gap_seconds * 1000
    out_schema = T.StructType(
        [
            T.StructField(key_col, stream.schema[key_col].dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("starts", T.ArrayType(T.LongType())),
            T.StructField("lasts", T.ArrayType(T.LongType())),
            T.StructField("ns", T.ArrayType(T.LongType())),
        ]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [[s, e, c] for s, e, c in zip(starts, lasts, ns)]
        else:
            sessions = []
        had_events = False
        if not state.hasTimedOut:
            # row order within a micro-batch group is arbitrary — and
            # rows older than the watermark are dropped here (late-data
            # contract above); the engine does not pre-filter them
            ts_ms = sorted(
                t
                for pdf in pdfs
                for t in (pdf[ts_col].astype("int64") // 1_000_000).tolist()
                if t >= wm_ms
            )
            had_events = bool(ts_ms)
            # flag 0 = pre-existing open session, 1 = new event — only
            # the _mutate paths read it; the unmutated grouping is the
            # same interval merge as before (group start = first sorted
            # member's start, end = running max, counts sum)
            items = sorted(
                [[s, e, c, 0] for s, e, c in sessions]
                + [[t, t, 1, 1] for t in ts_ms]
            )
            groups: list[list[list[int]]] = []
            end = -1
            for it in items:
                bridge_block = (
                    _mutate == "no_bridge"
                    and it[3] == 0
                    and groups
                    and any(m[3] == 0 for m in groups[-1])
                )
                if groups and it[0] - end <= gap_ms and not bridge_block:
                    groups[-1].append(it)
                    end = max(end, it[1])
                else:
                    groups.append([it])
                    end = it[1]
            sessions = []
            for g in groups:
                s = g[0][0]
                if _mutate == "no_backward" and any(m[3] == 0 for m in g):
                    s = min(m[0] for m in g if m[3] == 0)
                sessions.append(
                    [s, max(m[1] for m in g), sum(m[2] for m in g)]
                )
        if _mutate == "eager_seal" and had_events:
            closed, live = sessions[:-1], sessions[-1:]
        else:
            closed = [x for x in sessions if x[1] + gap_ms < wm_ms]
            live = [x for x in sessions if x[1] + gap_ms >= wm_ms]
        if live:
            state.update(
                (
                    [s for s, _, _ in live],
                    [e for _, e, _ in live],
                    [c for _, _, c in live],
                )
            )
            # fire when the earliest live session becomes sealable
            # (wm > end + gap); Spark rejects a timeout at-or-before
            # the current watermark, hence the clamp
            state.setTimeoutTimestamp(
                max(min(e for _, e, _ in live) + gap_ms + 1, wm_ms + 1)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def stateful_rolling_zscore(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
    window_rows: int = 10,
    quantize: int = 1_000_000,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``operators.temporal.rolling_zscore``: per-key
    ring buffer of the last ``window_rows`` QUANTIZED values kept in
    the state store; every arriving event scores against that buffer
    BEFORE being folded into it (the strictly-preceding baseline —
    same formula, same exact integer moments as the batch operator, so
    for in-order delivery a replayed stream emits byte-identical
    anomalies to the batch pass — pinned by test). Emits only rows
    beyond ``threshold`` sigma (append mode). State is ``window_rows``
    longs per key — bounded regardless of stream length.

    Twin-parity details (r16 hardening, found by self-review):

    - NULL/NaN values occupy a window SLOT but contribute nothing to
      the moments — exactly the batch twin's ROWS frame over null
      ``__q`` (count/sum skip nulls, the row still fills a frame
      position). Previously a null crashed the executor inside the
      Decimal quantizer.
    - ``order_tiebreak`` mirrors the batch twin's tie column, and the
      batch sort is STABLE (mergesort), so equal-timestamp replays are
      deterministic given deterministic arrival order.
    - moments are maintained INCREMENTALLY in exact Python ints (one
      O(window) pass to seed per batch, then O(1) per event — the old
      fold re-summed the buffer per event); Python ints never
      overflow, matching the batch twin's decimal(38,0) sum-of-squares
      accumulator."""
    import math

    out_schema = T.StructType(
        [
            T.StructField(key_col, stream.schema[key_col].dataType),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("buf", T.ArrayType(T.LongType()))])
    sort_cols = [ts_col] + ([order_tiebreak] if order_tiebreak else [])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        cnt = sum(1 for x in buf if x is not None)
        s = sum(x for x in buf if x is not None)
        ss = sum(x * x for x in buf if x is not None)
        ks, tss, vs, ns, zs = [], [], [], [], []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            sort_cols, kind="mergesort"
        )
        for ts_v, v in zip(rows[ts_col].tolist(), rows[value_col].tolist()):
            null = v is None or (isinstance(v, float) and math.isnan(v))
            q = None if null else _quantize_half_up(float(v), quantize)
            if q is not None and cnt > 1:
                sf, nf = float(s), float(cnt)
                var = (float(ss) - sf * sf / nf) / nf
                if var > 0:
                    z = (float(q) - sf / nf) / math.sqrt(var)
                    if abs(z) > threshold:
                        ks.append(key[0]), tss.append(ts_v)
                        vs.append(float(v)), ns.append(cnt), zs.append(z)
            buf.append(q)
            if q is not None:
                cnt, s, ss = cnt + 1, s + q, ss + q * q
            if len(buf) > window_rows:
                old = buf.pop(0)
                if old is not None:
                    cnt, s, ss = cnt - 1, s - old, ss - old * old
        state.update((buf,))
        yield pd.DataFrame(
            {
                key_col: pd.Series(ks),
                ts_col: pd.Series(tss, dtype="datetime64[us]"),
                value_col: pd.Series(vs, dtype="float64"),
                "n": pd.Series(ns, dtype="int64"),
                "z": pd.Series(zs, dtype="float64"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
