"""Merge-on-read store tests: a replication batch must land as a
batch-sized delta layer (base parquet untouched — the O(|batch|)
write-cost property that matters at 100 TB), fold back to exactly the
state a whole-table merge would produce, compact once the layer bound
is hit, and keep snapshot-isolation/time-travel semantics."""

from __future__ import annotations

import os

import pytest

from osmexpress_spark import schemas, testing
from osmexpress_spark.operators import edges as edges_mod
from osmexpress_spark.operators.update import apply_changes
from osmexpress_spark.store import DEFAULT_SORT, SnapshotStore
from osmexpress_spark.streaming import replication
from tests.test_update import python_model_apply, state_from_rows


@pytest.fixture()
def fresh(spark, tmp_path):
    rows = testing.generate(n_nodes=300, seed=11)
    batches = testing.generate_changes(rows, n_batches=3, per_batch=30, seed=7)
    dfs = testing.to_dataframes(spark, rows)
    dfs.update(edges_mod.derive_all(dfs["ways"], dfs["relations"]))
    store = SnapshotStore.create(
        spark, str(tmp_path / "ds"), dfs, metadata={"seqnum": 0},
        sort_by=DEFAULT_SORT,
    )
    return rows, batches, store


def _base_files(store, name):
    entry = store._manifest()["tables"][name]
    rel = entry if isinstance(entry, str) else entry["base"]
    d = os.path.join(store.root, rel)
    return rel, sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


@pytest.mark.slow
def test_merge_layers_match_model_and_reuse_base(spark, fresh):
    rows, batches, store = fresh
    state = state_from_rows(rows)
    base_before = {n: _base_files(store, n) for n in store.tables()}

    # apply through the replication merge path
    applied = replication.catch_up(
        store,
        spark.createDataFrame(
            [row for b in batches for row in b], schemas.CHANGES_SCHEMA
        ),
    )
    assert applied  # at least one seqnum went through merge_commit

    for batch in batches:
        state = python_model_apply(state, batch)

    got_loc = {
        r.id: (r.id, r.lon, r.lat, r.version, r.cell)
        for r in store.read_table("locations").collect()
    }
    assert got_loc == state["locations"]
    got_nodes = {
        r.id: (r.id, dict(r.tags)) for r in store.read_table("nodes").collect()
    }
    assert got_nodes == state["nodes"]
    got_ways = {
        r.id: (r.id, list(r.nodes), dict(r.tags))
        for r in store.read_table("ways").collect()
    }
    assert got_ways == state["ways"]
    got_rels = {
        r.id: (r.id, [tuple(m) for m in r.members], dict(r.tags))
        for r in store.read_table("relations").collect()
    }
    assert got_rels == state["relations"]

    # the U2/U3 mirror invariant holds through layered reads
    fresh_edges = edges_mod.derive_all(
        store.read_table("ways"), store.read_table("relations")
    )
    for name, df in fresh_edges.items():
        maintained = store.read_table(name)
        assert sorted(map(tuple, maintained.collect())) == sorted(
            map(tuple, df.collect())
        ), name

    # O(|batch|) write property: every touched table's BASE files are the
    # v0 files, byte-for-byte untouched — only layers were added
    for name in store.tables():
        entry = store._manifest()["tables"][name]
        if isinstance(entry, dict):
            assert (entry["base"], _base_files(store, name)[1]) == base_before[name]
            assert entry["layers"], name


@pytest.mark.slow
def test_compaction_bounds_layers(spark, fresh):
    rows, batches, store = fresh
    state = state_from_rows(rows)
    # max_layers=1 => second merge on a table compacts it
    result1 = apply_changes(
        store.read_all(), spark.createDataFrame(batches[0], schemas.CHANGES_SCHEMA)
    )
    store.merge_commit(
        result1.merge_specs, metadata={"seqnum": 1},
        sort_by=DEFAULT_SORT, max_layers=1,
    )
    result2 = apply_changes(
        store.read_all(), spark.createDataFrame(batches[1], schemas.CHANGES_SCHEMA)
    )
    store.merge_commit(
        result2.merge_specs, metadata={"seqnum": 2},
        sort_by=DEFAULT_SORT, max_layers=1,
    )
    for batch in batches[:2]:
        state = python_model_apply(state, batch)

    got_loc = {
        r.id: (r.id, r.lon, r.lat, r.version, r.cell)
        for r in store.read_table("locations").collect()
    }
    assert got_loc == state["locations"]
    # locations was merged twice -> compacted back to zero layers
    entry = store._manifest()["tables"]["locations"]
    assert isinstance(entry, dict) and entry["layers"] == []


@pytest.mark.slow
def test_optimize_folds_layers_and_preserves_state(spark, fresh):
    rows, batches, store = fresh
    chg = spark.createDataFrame(batches[0], schemas.CHANGES_SCHEMA)
    replication.catch_up(store, chg)
    before = sorted(map(tuple, store.read_table("locations").collect()))
    v = store.optimize(sort_by=DEFAULT_SORT)
    after = sorted(map(tuple, store.read_table("locations", version=v).collect()))
    assert before == after
    for name in store.tables():
        entry = store._manifest()["tables"][name]
        assert isinstance(entry, str) or entry["layers"] == []


@pytest.mark.slow
def test_time_travel_spans_merge_commits(spark, fresh):
    rows, batches, store = fresh
    v0 = store.latest_version()
    n0 = store.read_table("locations").count()
    replication.catch_up(
        store,
        spark.createDataFrame(
            [row for b in batches for row in b], schemas.CHANGES_SCHEMA
        ),
    )
    assert store.read_table("locations", version=v0).count() == n0


@pytest.mark.slow
def test_double_publish_same_version_fails_loudly(fresh):
    # two writers racing to the same version number must not silently
    # clobber each other's manifest: the second publish raises
    _, _, store = fresh
    v = store.latest_version()
    manifest = store._manifest(v)
    with pytest.raises(FileExistsError):
        store._publish(manifest, v)
    # the original manifest is untouched
    assert store._manifest(v) == manifest
