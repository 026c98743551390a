"""Custom stateful streaming operator: sessions close when the
event-time watermark passes their gap; state is bounded per key."""

from __future__ import annotations

import pytest

import datetime
import os
import uuid

from pyspark.sql import functions as F

from osmexpress_spark.streaming import stateful


def _write_batch(spark, feed, rows, n):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("append").parquet(feed)
    return n + len(rows)


def _ts(minute, second=0):
    return datetime.datetime(2026, 1, 1, 10, minute, second)


@pytest.mark.slow
def test_sessionize_stream_closes_on_watermark(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    name = "sessions_" + uuid.uuid4().hex[:8]

    # batch 1: two users, tight event clusters
    _write_batch(
        spark,
        feed,
        [
            (1, _ts(0)), (1, _ts(1)), (1, _ts(2)),
            (2, _ts(0, 30)), (2, _ts(4)),
        ],
        0,
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .format("parquet")
        .load(feed)
    )
    sessions = stateful.sessionize_stream(
        stream, gap_seconds=300, watermark="1 minutes"
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing closed yet: watermark hasn't passed end + gap
        assert spark.table(name).count() == 0

        # batch 2: much later events advance the watermark far past both
        # users' (end + gap) -> their first sessions close and emit
        _write_batch(spark, feed, [(1, _ts(30)), (3, _ts(31))], 5)
        q.processAllAvailable()
        # one more batch so the new watermark triggers the timeouts
        _write_batch(spark, feed, [(3, _ts(32))], 7)
        q.processAllAvailable()

        got = {
            r.user_id: r
            for r in spark.table(name).collect()
        }
        assert 1 in got and 2 in got
        s1 = got[1]
        assert s1.session_start == _ts(0)
        assert s1.session_end == _ts(2)
        assert s1.n_events == 3
        s2 = got[2]
        assert s2.session_start == _ts(0, 30)
        assert s2.session_end == _ts(4)
        assert s2.n_events == 2
    finally:
        q.stop()


@pytest.mark.slow
def test_topk_stream_merges_state_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the second emission
    per key must be the MERGED top-k (state carries batch 1's best),
    and state stays bounded at k pairs."""
    feed = str(tmp_path / "topk_feed")
    os.makedirs(feed, exist_ok=True)
    s1 = spark.createDataFrame(
        [(1, 100, 5.0), (1, 101, 9.0), (1, 102, 1.0), (2, 200, 4.0)],
        "user_id long, event_id long, value double",
    )
    s1.coalesce(1).write.mode("append").parquet(feed)
    stream = (
        spark.readStream.schema("user_id long, event_id long, value double")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(feed)
    )
    out = stateful.topk_stream(stream, k=2)
    name = "topk_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.user_id, r.topk_rank): r.event_id
            for r in spark.table(name).collect()
        }
        # batch 1: user 1 top-2 = 101 (9.0), 100 (5.0)
        assert first[(1, 1)] == 101 and first[(1, 2)] == 100
        # batch 2: a new global best for user 1, a tie-by-id for user 2
        s2 = spark.createDataFrame(
            [(1, 103, 9.5), (2, 199, 4.0)],
            "user_id long, event_id long, value double",
        )
        s2.coalesce(1).write.mode("append").parquet(feed)
        q.processAllAvailable()
        rows = spark.table(name).collect()
        # keep only each key's LAST emission (rank rows re-emitted)
        latest = {}
        for r in rows:
            latest[(r.user_id, r.topk_rank)] = r.event_id
        assert latest[(1, 1)] == 103   # merged: 9.5 beats stored 9.0
        assert latest[(1, 2)] == 101   # 9.0 survives, 5.0 evicted
        assert latest[(2, 1)] == 199   # tie at 4.0 -> lower id wins
        assert latest[(2, 2)] == 200
    finally:
        q.stop()


@pytest.mark.slow
def test_observe_stream_reports_per_batch_metrics(spark, tmp_path):
    """Streaming observe: per-micro-batch counters appear in
    StreamingQueryProgress.observedMetrics without any extra pass."""
    import json

    from osmexpress_spark.operators import metrics as M

    feed = str(tmp_path / "obs_feed")
    os.makedirs(feed, exist_ok=True)
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 2.0)], "id long, v double"
    ).coalesce(1).write.mode("append").parquet(feed)
    stream = (
        spark.readStream.schema("id long, v double")
        .format("parquet")
        .load(feed)
    )
    observed = M.observe_stream(
        stream, "health",
        n_rows=F.count(F.lit(1)),
        n_neg=F.sum(F.when(F.col("v") < 0, 1).otherwise(0)),
    )
    name = "obs_" + uuid.uuid4().hex[:8]
    q = (
        observed.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
        got = None
        for p in q.recentProgress:
            om = p["observedMetrics"] if isinstance(p, dict) else json.loads(p.json)["observedMetrics"]
            if "health" in om:
                got = om["health"]
        assert got is not None
        assert got["n_rows"] == 3 and got["n_neg"] == 1
    finally:
        q.stop()
