"""Replication feed application (operator U5).

The reference's streaming story is a strictly-ordered minutely diff
feed applied as idempotent transactions: `utils/osmx-update:15-48`
locks, reads the committed seqnum, downloads seqnum+1..latest and
applies each in one LMDB txn with the new seqnum+timestamp committed
atomically. No watermarks or event-time windows — total order by
sequence number.

Spark-native shape (SURVEY.md §2.6):
- the feed is a directory of change batches (parquet, one seqnum per
  file/batch — the .osc XML form goes through sources.osc first);
- `catch_up` is the batch loop: apply every pending seqnum in order,
  one SnapshotStore commit per batch -> exactly-once, resumable,
  dry-runnable;
- `stream` wraps the same application in Structured Streaming
  (file source + foreachBatch): the sink-side seqnum check makes the
  at-least-once file source effectively exactly-once (the classic
  idempotent-foreachBatch pattern);
- event-time windowing over the feed is exposed separately
  (queries_data.q_stream_windowed) — the reference has no analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.update import merge_specs_for
from ..store import DEFAULT_SORT, SnapshotStore


def committed_seqnum(store: SnapshotStore) -> int:
    return int(store.metadata().get("seqnum", 0))


# element type -> tables its changes can touch (mirrors the reference's
# per-type update handlers: src/update.cpp:33-75 nodes, :78-126 ways,
# :129-213 relations)
_AFFECTED = {
    "node": {"locations", "nodes"},
    "way": {"ways", "node_way"},
    "relation": {
        "relations",
        "node_relation",
        "way_relation",
        "relation_relation",
    },
}


def apply_batch(
    store: SnapshotStore,
    changes: DataFrame,
    seqnum: int,
    commit: bool = True,
    types: set[str] | None = None,
    metadata: dict | None = None,
) -> bool:
    """Apply one seqnum batch transactionally; skip if already applied
    (idempotence); `commit=False` is the reference's dry-run
    (src/update.cpp:287-290).

    Commits go through `merge_commit`: each affected table gains one
    batch-sized delta layer — upsert rows + changed-key set — while
    base files stay untouched (write cost O(|batch|), the analog of
    the reference dirtying only touched LMDB pages per minutely diff).
    Unaffected tables keep pointing at their prior files; layer
    build-up compacts automatically past `max_layers`."""
    if seqnum <= committed_seqnum(store):
        return False
    # batch-only spec construction: the commit path never reads (or even
    # plans over) the base tables — merge_commit lands the batch-sized
    # layers and the manifest does the rest. Folding happens at read
    # time; dry-run still derives the full batch plans and discards.
    specs, _ = merge_specs_for(changes)
    if commit:
        given = dict(metadata or {})
        need_ts = "timestamp" not in given
        if types is None or need_ts:
            # ONE driver job discovers both the batch's type set and its
            # newest element timestamp (was two separate blocking jobs —
            # per-batch fixed cost matters at minutely cadence)
            agg = changes.agg(
                F.collect_set("type").alias("tps"),
                F.max("metadata.timestamp").alias("ts"),
            ).collect()[0]
            if types is None:
                types = set(agg["tps"])
            batch_ts = agg["ts"] if need_ts else None
        else:
            batch_ts = None
        affected = set().union(*(_AFFECTED[t] for t in types)) if types else set()
        merges = {
            name: spec
            for name, spec in specs.items()
            if name in affected and name in store.tables()
        }
        # REPLICATION metadata carries forward (a batch whose elements
        # have no timestamps must not erase the snapshot's replication
        # state), and the timestamp is a watermark that never rewinds.
        # Only the replication keys are inherited — version-descriptive
        # keys (committed_at, optimize()'s `optimized`) describe ONE
        # manifest and must not leak onto later commits.
        # (committed_seqnum above already raised on an empty store.)
        prev_all = store.metadata()
        prev = {
            k: prev_all[k]
            for k in ("timestamp", "bootstrap")
            if k in prev_all
        }
        meta = {**prev, **given}
        if need_ts and batch_ts is not None:
            new_ts = batch_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            if new_ts > meta.get("timestamp", ""):
                meta["timestamp"] = new_ts
        store.merge_commit(
            merges,
            metadata={**meta, "seqnum": seqnum},
            sort_by=DEFAULT_SORT,
        )
    return True


def catch_up(
    store: SnapshotStore,
    changes: DataFrame,
    commit: bool = True,
    state_source=None,
) -> list[int]:
    """U5 catch-up loop: apply every pending seqnum in ascending order.
    `changes` holds rows for one or many seqnums (CHANGES_SCHEMA).
    One driver job discovers (seqnum, type) pairs for the whole feed so
    each batch application skips its own discovery pass.

    `state_source` enables the osmx-update bootstrap (utils/
    osmx-update:15-33): a store that has never committed a seqnum but
    carries a `timestamp` in its metadata (fresh expand) resolves its
    starting sequence by binary search over the feed's state files
    (feedstate.timestamp_to_seqnum) instead of replaying from 0."""
    committed = committed_seqnum(store)
    if committed == 0 and state_source is not None:
        from .feedstate import bootstrap_seqnum

        boot = bootstrap_seqnum(store, state_source)
        if boot is not None:
            committed = boot
    pairs = changes.select("seqnum", "type").distinct().collect()
    types_by_seq: dict[int, set[str]] = {}
    for r in pairs:
        if r.seqnum > committed:
            types_by_seq.setdefault(r.seqnum, set()).add(r.type)
    applied = []
    for seq in sorted(types_by_seq):
        batch = changes.where(F.col("seqnum") == seq)
        if apply_batch(store, batch, seq, commit=commit, types=types_by_seq[seq]):
            applied.append(seq)
    return applied


def http_catch_up(
    spark: SparkSession,
    store: SnapshotStore,
    base_url: str,
    commit: bool = True,
    limit: int | None = None,
    timeout: float = 30.0,
) -> list[int]:
    """Catch up from a remote replication server (the reference's
    deployment shape, utils/osmx-update:15-48): read the server's
    ``state.txt``, resume from the store's committed seqnum — or, on a
    fresh expand, from the timestamp→seqnum binary search over the
    server's state files (utils/server.py:27-107) — then download and
    apply each pending ``NNN/NNN/NNN.osc.gz`` in order, one
    transactional merge-commit per sequence, recording the sequence's
    state timestamp alongside the seqnum. Stops cleanly at the first
    hole (not-yet-published or garbage-collected diff). A local
    directory served by any static HTTP server is protocol-identical
    (the test fake); only the driver downloads — batches are
    minutes-sized by construction."""
    import os
    import tempfile

    from ..sources.osc import read_osc
    from .feedstate import HttpStateSource, bootstrap_seqnum, diff_path

    source = HttpStateSource(base_url, timeout=timeout)
    latest = source.latest()
    if latest is None:
        return []
    committed = committed_seqnum(store)
    if committed == 0:
        boot = bootstrap_seqnum(store, source)
        if boot is not None:
            committed = boot
    applied: list[int] = []
    seq = committed + 1
    while seq <= latest.sequence and (limit is None or len(applied) < limit):
        payload = source.fetch(diff_path(seq))
        if payload is None:
            break
        fd, tmp = tempfile.mkstemp(suffix=".osc.gz")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            changes = read_osc(spark, tmp, seqnum=seq)
            st = source.state(seq)
            meta = (
                {"timestamp": st.timestamp.strftime("%Y-%m-%dT%H:%M:%SZ")}
                if st is not None
                else {}
            )
            if apply_batch(store, changes, seq, commit=commit, metadata=meta):
                applied.append(seq)
        finally:
            os.unlink(tmp)
        seq += 1
    return applied


def stream(
    spark: SparkSession,
    store: SnapshotStore,
    feed_dir: str,
    checkpoint_dir: str,
    poll_interval: str = "10 seconds",
):
    """Structured Streaming form: watch feed_dir for new change files and
    apply them in seqnum order via foreachBatch. Returns the running
    StreamingQuery (caller stops it / processAllAvailable in tests)."""
    src = (
        spark.readStream.schema(schemas.CHANGES_SCHEMA)
        .format("parquet")
        .load(feed_dir)
    )

    def apply_micro_batch(batch_df: DataFrame, _epoch: int) -> None:
        # one micro-batch may carry several seqnums; keep total order and
        # idempotence sink-side
        catch_up(store, batch_df, commit=True)

    return (
        src.writeStream.foreachBatch(apply_micro_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=poll_interval)
        .start()
    )
