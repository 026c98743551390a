"""Replication (U5), augmented diff (U6): ordering, idempotence,
exactly-once streaming application, classification + propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmexpress_spark import schemas, testing
from osmexpress_spark.operators import edges as edges_mod
from osmexpress_spark.operators.diff import augmented_diff
from osmexpress_spark.store import DEFAULT_SORT, SnapshotStore
from osmexpress_spark.streaming import replication


@pytest.fixture()
def fresh_store(spark, tmp_path):
    rows = testing.generate(n_nodes=200, seed=3)
    dfs = testing.to_dataframes(spark, rows)
    dfs.update(edges_mod.derive_all(dfs["ways"], dfs["relations"]))
    store = SnapshotStore.create(
        spark, str(tmp_path / "store"), dfs, metadata={"seqnum": 0},
        sort_by=DEFAULT_SORT,
    )
    batches = testing.generate_changes(rows, n_batches=3, per_batch=15, seed=17)
    return rows, batches, store


@pytest.mark.slow
def test_catch_up_applies_in_order_and_idempotently(spark, fresh_store):
    rows, batches, store = fresh_store
    all_changes = spark.createDataFrame(
        [r for b in batches for r in b], schemas.CHANGES_SCHEMA
    )
    applied = replication.catch_up(store, all_changes)
    assert applied == [1, 2, 3]
    assert replication.committed_seqnum(store) == 3
    # idempotent: re-applying the same feed is a no-op
    assert replication.catch_up(store, all_changes) == []
    assert replication.committed_seqnum(store) == 3


@pytest.mark.slow
def test_catch_up_dry_run(spark, fresh_store):
    rows, batches, store = fresh_store
    changes = spark.createDataFrame(batches[0], schemas.CHANGES_SCHEMA)
    before = store.latest_version()
    applied = replication.catch_up(store, changes, commit=False)
    assert applied == [1]
    assert store.latest_version() == before


@pytest.mark.slow
def test_streaming_feed(spark, fresh_store, tmp_path):
    rows, batches, store = fresh_store
    feed = tmp_path / "feed"
    ckpt = tmp_path / "ckpt"
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, schemas.CHANGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))
    q = replication.stream(spark, store, str(feed), str(ckpt))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert replication.committed_seqnum(store) == 3
    # final state equals batch-mode application on a fresh copy
    fresh = SnapshotStore(spark, store.root)
    assert fresh.read_table("locations").count() > 0


@pytest.mark.slow
def test_augmented_diff_classification_and_propagation(spark, fresh_store):
    rows, batches, store = fresh_store
    tables = store.read_all()
    node_id = rows["locations"][0][0]
    new_node_id = max(r[0] for r in rows["locations"]) + 1000
    meta = (500, None, 1, 1, "u")
    batch = [
        (1, "modify", "node", node_id, True, 100, 200, None, None, {"a": "b"}, meta),
        (1, "create", "node", new_node_id, True, 5, 5, None, None, None, meta),
        (1, "delete", "node", 999_999_998, False, None, None, None, None, None, meta),
    ]
    chg = spark.createDataFrame(batch, schemas.CHANGES_SCHEMA)
    out = augmented_diff(tables, chg).collect()
    by_key = {(r.type, r.id): r for r in out}
    assert by_key[("node", node_id)].action == "modify"
    assert by_key[("node", node_id)].direct
    assert by_key[("node", node_id)].new_lon == 100
    assert by_key[("node", new_node_id)].action == "create"
    assert by_key[("node", 999_999_998)].action == "delete_not_in_db"
    # propagation: every way containing the moved node appears indirectly
    parent_ways = {w[0] for w in rows["ways"] if node_id in w[1]}
    for wid in parent_ways:
        assert by_key[("way", wid)].action == "modify"
        assert not by_key[("way", wid)].direct
    # and relations containing those ways or the node itself
    parent_rels = {
        r[0]
        for r in rows["relations"]
        if any(
            (m[1] == "node" and m[0] == node_id)
            or (m[1] == "way" and m[0] in parent_ways)
            for m in r[1]
        )
    }
    for rid in parent_rels:
        assert by_key[("relation", rid)].action == "modify"
        assert not by_key[("relation", rid)].direct
    # per-way old/new bounds (reference augmented_diff.py 5th pass):
    # old bbox over snapshot member positions, new bbox with the moved
    # node at its post-batch position
    loc = {r[0]: (r[1], r[2]) for r in rows["locations"]}
    new_loc = dict(loc)
    new_loc[node_id] = (100, 200)
    for wid in parent_ways:
        refs = next(w[1] for w in rows["ways"] if w[0] == wid)
        row = by_key[("way", wid)]
        for (pos, pre) in ((loc, "old"), (new_loc, "new")):
            xs = [pos[r][0] for r in refs]
            ys = [pos[r][1] for r in refs]
            assert (
                getattr(row, f"{pre}_minlon"), getattr(row, f"{pre}_minlat"),
                getattr(row, f"{pre}_maxlon"), getattr(row, f"{pre}_maxlat"),
            ) == (min(xs), min(ys), max(xs), max(ys))
    # node rows carry no way bbox
    assert by_key[("node", node_id)].old_minlon is None


# --- timestamp -> seqnum bootstrap (utils/server.py:27-107) ---------------
def _write_state(dirpath, seq, ts, nested=True, latest=False):
    import os

    from osmexpress_spark.streaming import feedstate

    rel = "state.txt" if latest else feedstate.seq_path(seq)
    if not nested and not latest:
        rel = f"{seq}.state.txt"
    p = os.path.join(dirpath, rel)
    os.makedirs(os.path.dirname(p) or dirpath, exist_ok=True)
    iso = ts.strftime("%Y-%m-%dT%H\\:%M\\:%SZ")
    with open(p, "w") as f:
        f.write(f"#comment line\nsequenceNumber={seq}\ntimestamp={iso}\n")


def test_timestamp_to_seqnum_binary_search(tmp_path):
    from datetime import datetime, timedelta, timezone

    from osmexpress_spark.streaming import feedstate

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    feed = str(tmp_path / "feed")
    # irregular feed: minutely-ish with jitter, some states missing
    # (garbage-collected), sequences 10..60
    states = {}
    for seq in range(10, 61):
        if seq in (17, 18, 33, 50):
            continue
        states[seq] = base + timedelta(minutes=2 * seq + (seq % 3))
        _write_state(feed, seq, states[seq], nested=(seq % 2 == 0))
    latest_seq = max(states)
    _write_state(feed, latest_seq, states[latest_seq], latest=True)
    src = feedstate.DirStateSource(feed)

    assert src.latest().sequence == latest_seq
    assert src.state(17) is None
    # contract: greatest available seq whose timestamp < requested
    for target_seq in (12, 23, 34, 48, 59):
        ts = states[target_seq]
        expected = max(s for s, t in states.items() if t < ts)
        got = feedstate.timestamp_to_seqnum(src, ts)
        assert got == expected, (target_seq, got, expected)
    # newer than the whole feed -> newest
    assert (
        feedstate.timestamp_to_seqnum(src, states[latest_seq] + timedelta(hours=1))
        == latest_seq
    )
    # older than the whole feed -> oldest available
    assert feedstate.timestamp_to_seqnum(src, base) == 10


@pytest.mark.slow
def test_catch_up_bootstraps_from_timestamp(spark, tmp_path, fresh_store):
    """A store with only a post-expand timestamp resumes mid-feed: the
    bootstrap resolves its seqnum from the state files, so earlier
    batches are skipped and later ones applied (osmx-update:15-48)."""
    from datetime import datetime, timedelta, timezone

    from osmexpress_spark.streaming import feedstate

    rows, batches, store = fresh_store
    base = datetime(2024, 6, 1, tzinfo=timezone.utc)
    feed = str(tmp_path / "feed_state")
    for seq in (1, 2, 3):
        _write_state(feed, seq, base + timedelta(minutes=seq))
    _write_state(feed, 3, base + timedelta(minutes=3), latest=True)
    # expand timestamp sits just after batch 2's state
    meta = dict(store.metadata())
    meta.pop("seqnum", None)
    meta["timestamp"] = (base + timedelta(minutes=2, seconds=30)).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    store.set_metadata(meta)
    all_changes = spark.createDataFrame(
        [r for b in batches for r in b], schemas.CHANGES_SCHEMA
    )
    applied = replication.catch_up(
        store, all_changes, state_source=feedstate.DirStateSource(feed)
    )
    assert applied == [3]
    assert replication.committed_seqnum(store) == 3


# --- remote HTTP replication transport (utils/osmx-update:15-48) ----------
@pytest.mark.slow
def test_http_catch_up_from_local_server(spark, tmp_path):
    """End-to-end remote catch-up: a static HTTP server fronts a feed
    directory (state files + per-seq .osc.gz); a store that only knows
    its expand timestamp bootstraps its seqnum via the binary search
    over the SERVER's state files, then downloads and applies every
    pending diff transactionally."""
    import functools
    import gzip
    import http.server
    import os
    import threading
    from datetime import datetime, timedelta, timezone

    from osmexpress_spark.streaming import feedstate

    feed = str(tmp_path / "feed")
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    oscs = {
        1: '<osmChange version="0.6"><modify>'
           '<node id="1" lon="3.0" lat="4.0" version="2"/></modify></osmChange>',
        2: '<osmChange version="0.6"><create>'
           '<node id="9001" lon="1.0" lat="1.0" version="1"/></create></osmChange>',
        3: '<osmChange version="0.6"><delete>'
           '<node id="2" version="2"/></delete></osmChange>',
    }
    for seq, xml in oscs.items():
        _write_state(feed, seq, base + timedelta(minutes=seq))
        with gzip.open(os.path.join(feed, feedstate.diff_path(seq)), "wt") as f:
            f.write(xml)
    _write_state(feed, 3, base + timedelta(minutes=3), latest=True)

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=feed
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        rows = testing.generate(n_nodes=100, seed=5)
        dfs = testing.to_dataframes(spark, rows)
        dfs.update(edges_mod.derive_all(dfs["ways"], dfs["relations"]))
        # fresh-expand store: no seqnum, timestamp between state 1 and 2
        # -> bootstrap resolves seq 1, so only 2..3 replay
        ts = (base + timedelta(seconds=90)).strftime("%Y-%m-%dT%H:%M:%SZ")
        store = SnapshotStore.create(
            spark, str(tmp_path / "store"), dfs,
            metadata={"timestamp": ts}, sort_by=DEFAULT_SORT,
        )
        applied = replication.http_catch_up(spark, store, url)
        assert applied == [2, 3]
        assert replication.committed_seqnum(store) == 3
        # the applied sequence's state timestamp is recorded at commit
        assert store.metadata()["timestamp"] == "2024-01-01T00:03:00Z"
        loc = store.read_table("locations")
        assert loc.where(F.col("id") == 9001).count() == 1
        assert loc.where(F.col("id") == 2).count() == 0
        # idempotent: nothing pending on a second pass
        assert replication.http_catch_up(spark, store, url) == []
    finally:
        srv.shutdown()


def _serve(feed: str):
    """Static HTTP server over a feed dir; returns (server, base_url)."""
    import functools
    import http.server
    import threading

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=feed
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


@pytest.mark.slow
def test_http_feed_404_at_head(spark, tmp_path):
    """Edge case (utils/server.py:27-107): the server has no state.txt
    at all (404 at the feed head). latest() must read as None — not
    raise — the bootstrap must resolve to None, and http_catch_up must
    report nothing pending instead of crashing or committing."""
    import os
    from datetime import datetime, timezone

    from osmexpress_spark.streaming import feedstate

    feed = str(tmp_path / "empty_feed")
    os.makedirs(feed)
    srv, url = _serve(feed)
    try:
        src = feedstate.HttpStateSource(url)
        assert src.latest() is None
        assert src.state(7) is None
        ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
        assert feedstate.timestamp_to_seqnum(src, ts) is None

        rows = testing.generate(n_nodes=60, seed=5)
        dfs = testing.to_dataframes(spark, rows)
        dfs.update(edges_mod.derive_all(dfs["ways"], dfs["relations"]))
        store = SnapshotStore.create(
            spark, str(tmp_path / "store404"), dfs,
            metadata={"timestamp": "2024-01-01T00:00:00Z"},
            sort_by=DEFAULT_SORT,
        )
        before = store.metadata()
        assert replication.http_catch_up(spark, store, url) == []
        assert store.metadata() == before
    finally:
        srv.shutdown()


def test_http_truncated_state_file_raises_clearly(tmp_path):
    """Edge case: a truncated/corrupt state.txt (half an osmosis file)
    must raise a clear ValueError at parse time — not return a bogus
    FeedState that would mis-steer the binary search — while a 404
    still reads as None (the two failure shapes stay distinct)."""
    import os

    import pytest as _pytest

    from osmexpress_spark.streaming import feedstate

    feed = str(tmp_path / "trunc_feed")
    os.makedirs(feed)
    # timestamp line lost mid-write
    with open(os.path.join(feed, "state.txt"), "w") as f:
        f.write("#Mon Jan 01 00:00:01 UTC 2024\nsequenceNumber=42\n")
    srv, url = _serve(feed)
    try:
        src = feedstate.HttpStateSource(url)
        with _pytest.raises(ValueError, match="missing sequenceNumber or timestamp"):
            src.latest()
        assert src.state(41) is None  # 404 path unchanged
    finally:
        srv.shutdown()
    # and an empty file behaves the same as a truncated one
    with open(os.path.join(feed, "state.txt"), "w") as f:
        f.write("")
    with _pytest.raises(ValueError):
        feedstate.parse_state("")


def test_http_timestamp_older_than_first_state(tmp_path):
    """Edge case: the store's expand timestamp predates the oldest
    state file the server still has (0..4 garbage-collected, feed holds
    5..8). The binary search must converge on the oldest AVAILABLE
    sequence — the documented best-effort resume point — probing 404s
    outward rather than looping or raising."""
    from datetime import datetime, timedelta, timezone

    from osmexpress_spark.streaming import feedstate

    feed = str(tmp_path / "gc_feed")
    base = datetime(2024, 3, 1, tzinfo=timezone.utc)
    for seq in (5, 6, 7, 8):
        _write_state(feed, seq, base + timedelta(minutes=seq))
    _write_state(feed, 8, base + timedelta(minutes=8), latest=True)
    srv, url = _serve(feed)
    try:
        src = feedstate.HttpStateSource(url)
        # a full day before anything on the feed
        got = feedstate.timestamp_to_seqnum(src, base - timedelta(days=1))
        assert got == 5
        # and the normal mid-feed contract still holds over HTTP with
        # the garbage-collected prefix present
        mid = base + timedelta(minutes=6, seconds=30)
        assert feedstate.timestamp_to_seqnum(src, mid) == 6
        newer = base + timedelta(hours=2)
        assert feedstate.timestamp_to_seqnum(src, newer) == 8
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_apply_batch_metadata_merges_and_never_rewinds(spark, tmp_path):
    """A diff whose elements carry NO timestamps must not erase the
    snapshot's replication timestamp, and an older-element diff must
    not move it backward (the manifest metadata MERGES, timestamp is a
    watermark)."""
    import datetime as dt

    from osmexpress_spark import testing
    from osmexpress_spark.store import DEFAULT_SORT, SnapshotStore
    from osmexpress_spark.streaming.replication import apply_batch

    rows = testing.generate(n_nodes=60, seed=5)
    store = SnapshotStore.create(
        spark,
        str(tmp_path / "store"),
        testing.to_dataframes(spark, rows),
        metadata={"seqnum": 0, "timestamp": "2024-06-01T00:00:00Z",
                  "bootstrap": "test"},
        sort_by=DEFAULT_SORT,
    )
    # batch 1: no element timestamps at all (tuples follow
    # CHANGES_SCHEMA order: seqnum at 0, metadata struct at 10 with
    # timestamp as its second field)
    base = testing.generate_changes(rows, n_batches=1, per_batch=5)[0]

    def rewrite(batch, seq, ts):
        out = []
        for r in batch:
            r = list(r)
            r[0] = seq
            md = list(r[10])
            md[1] = ts
            r[10] = tuple(md)
            out.append(tuple(r))
        return out

    no_ts = rewrite(base, 1, None)
    changes1 = spark.createDataFrame(no_ts, testing.schemas.CHANGES_SCHEMA)
    assert apply_batch(store, changes1, 1, commit=True)
    m1 = store.metadata()
    assert m1["timestamp"] == "2024-06-01T00:00:00Z"   # preserved
    assert m1["bootstrap"] == "test"                   # carried forward
    assert m1["seqnum"] == 1
    # batch 2: elements OLDER than the watermark
    old_ts = rewrite(base, 2, dt.datetime(2020, 1, 1))
    changes2 = spark.createDataFrame(old_ts, testing.schemas.CHANGES_SCHEMA)
    assert apply_batch(store, changes2, 2, commit=True)
    m2 = store.metadata()
    assert m2["timestamp"] == "2024-06-01T00:00:00Z"   # no rewind
    assert m2["seqnum"] == 2
