"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (SURVEY.md §2.6 — the reference's streaming
surface is sequenced batch application; watermarks/session state are
the Spark-native extension called for by BASELINE.json).

Semantics: events (user_id, ts) accumulate per-user session state
(start, end, count). A session CLOSES when the event-time watermark
passes its end + gap — the state times out and the closed session row
is emitted (append mode). This is the unbounded-stream form of the
batch `q_sessionize` window query.

Scale notes: state lives in the state store partitioned by user_id —
per-key memory is three scalars regardless of event volume; the
watermark bounds retention. Arrow batches move the per-key rows, so
the Python hook cost is per-key-per-batch, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, end long, n long"  # epoch micros + count


def _session_fn(gap_seconds: int, close_on_timeout: bool = True):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if close_on_timeout and state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start = end = None
        n = 0
        if state.exists:
            start, end, n = state.get
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                int(x)
                for x in pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            )
        # data-driven splits: an event beyond end + gap CLOSES the open
        # session immediately (new data for a key preempts its timeout,
        # so the gap rule must also apply here)
        gap_us = gap_seconds * 1_000_000
        closed: list[tuple[int, int, int]] = []
        for t in sorted(ts_us):
            if start is None:
                start = end = t
                n = 1
            elif t - end > gap_us:
                closed.append((start, end, n))
                start = end = t
                n = 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        if close_on_timeout:
            # the open session closes when the watermark passes end+gap
            state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    close_on_timeout: bool = True,
) -> DataFrame:
    """Streaming DataFrame (user_col, ts_col, ...) -> closed sessions
    (append mode). Sessions close two ways: a later event beyond the
    gap (data-driven split, emitted immediately) or the event-time
    watermark passing end+gap (state timeout). close_on_timeout=False
    keeps only the data-driven path — emissions then depend solely on
    the data, never on watermark timing (used by the oracled contract
    query)."""
    prepared = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, close_on_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if close_on_timeout
        else GroupStateTimeout.NoTimeout,
    )


TOPK_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, topk_rank int"
)
TOPK_STATE_SCHEMA = "vals array<double>, ids array<long>"


def _topk_fn(k: int):
    def fn(key, pdfs, state):
        if state.exists:
            vals, ids = state.get
            best = list(zip(vals, ids))
        else:
            best = []
        for pdf in pdfs:
            best.extend(zip(pdf["value"], pdf["event_id"]))
        # keep k best by (value desc, id asc) — a bounded heap's worth
        # of state per key, exactly the TakeOrdered contract
        best.sort(key=lambda t: (-t[0], t[1]))
        best = best[:k]
        state.update(([v for v, _ in best], [i for _, i in best]))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(best), dtype="int64"),
                "event_id": pd.Series([i for _, i in best], dtype="int64"),
                "value": pd.Series([v for v, _ in best], dtype="float64"),
                "topk_rank": pd.Series(range(1, len(best) + 1), dtype="int32"),
            }
        )

    return fn


def topk_stream(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Streaming per-key top-k: the custom stateful aggregator Spark's
    built-in streaming aggregations can't express (collect_list + slice
    is unbounded state; this keeps exactly k (value, id) pairs per
    key). Each micro-batch merges its rows into the k-best state and
    emits the key's refreshed top-k (value desc, id tie-break), so
    after the final batch the last emission per key IS the global
    top-k — the streaming analog of TakeOrdered.

    State is O(k) per key — watermark-free by design (a running
    leaderboard never expires); bound key cardinality upstream the way
    any keyed-state operator requires."""
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(val_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _topk_fn(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
