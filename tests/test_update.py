"""Update-path tests: apply synthetic OsmChange batches through the
snapshot store and compare full table state against an independent
Python model of src/update.cpp semantics; edge tables must keep
mirroring the forward arrays (the U2/U3 invariant); dry-run commits
nothing; seqnum metadata rides the commit atomically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmexpress_spark import schemas, testing
from osmexpress_spark.operators import edges as edges_mod
from osmexpress_spark.operators.update import apply_changes
from osmexpress_spark.spatial import cells
from osmexpress_spark.store import DEFAULT_SORT, SnapshotStore


def python_model_apply(state, batch):
    """Independent model: state = dict of dicts keyed by id."""
    # last-wins per (type, id) by (version, seqnum)
    best = {}
    for row in batch:
        seq, action, typ, eid, visible, lon, lat, nodes, members, tags, meta = row
        key = (typ, eid)
        rank = (meta[0], seq)
        if key not in best or rank > best[key][0]:
            best[key] = (rank, row)
    for (_typ, _eid), (_rank, row) in best.items():
        seq, action, typ, eid, visible, lon, lat, nodes, members, tags, meta = row
        if typ == "node":
            state["locations"].pop(eid, None)
            state["nodes"].pop(eid, None)
            if visible:
                state["locations"][eid] = (
                    eid, lon, lat, meta[0], cells.cell_of(lon, lat)
                )
                if tags:
                    state["nodes"][eid] = (eid, dict(tags))
        elif typ == "way":
            state["ways"].pop(eid, None)
            if visible:
                state["ways"][eid] = (eid, list(nodes or []), dict(tags or {}))
        else:
            state["relations"].pop(eid, None)
            if visible:
                state["relations"][eid] = (
                    eid, [tuple(m) for m in (members or [])], dict(tags or {})
                )
    return state


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rows = testing.generate(n_nodes=400, seed=5)
    batches = testing.generate_changes(rows, n_batches=3, per_batch=40, seed=99)
    dfs = testing.to_dataframes(spark, rows)
    dfs.update(edges_mod.derive_all(dfs["ways"], dfs["relations"]))
    root = str(tmp_path_factory.mktemp("store") / "ds")
    store = SnapshotStore.create(
        spark, root, dfs, metadata={"seqnum": 0}, sort_by=DEFAULT_SORT
    )
    return rows, batches, store


def state_from_rows(rows):
    return {
        "locations": {r[0]: r for r in rows["locations"]},
        "nodes": {r[0]: (r[0], dict(r[1])) for r in rows["nodes"]},
        "ways": {r[0]: (r[0], list(r[1]), dict(r[2])) for r in rows["ways"]},
        "relations": {
            r[0]: (r[0], [tuple(m) for m in r[1]], dict(r[2])) for r in rows["relations"]
        },
    }


@pytest.mark.slow
def test_apply_batches_match_python_model(spark, setup):
    rows, batches, store = setup
    state = state_from_rows(rows)
    for i, batch in enumerate(batches):
        chg = spark.createDataFrame(batch, schemas.CHANGES_SCHEMA)
        result = apply_changes(store.read_all(), chg)
        v = store.commit(
            result.tables, metadata={"seqnum": i + 1}, sort_by=DEFAULT_SORT
        )
        assert store.metadata(v)["seqnum"] == i + 1
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

        # U2/U3 invariant: maintained edges == fresh derivation
        fresh = edges_mod.derive_all(
            store.read_table("ways"), store.read_table("relations")
        )
        for name, df in fresh.items():
            maintained = store.read_table(name)
            assert sorted(map(tuple, maintained.collect())) == sorted(
                map(tuple, df.collect())
            ), name


@pytest.mark.slow
def test_dry_run_commits_nothing(spark, setup):
    rows, batches, store = setup
    before = store.latest_version()
    chg = spark.createDataFrame(batches[0], schemas.CHANGES_SCHEMA)
    result = apply_changes(store.read_all(), chg)  # computed...
    assert result.counts  # ...and observable
    assert store.latest_version() == before  # ...but nothing committed


def test_snapshot_isolation_time_travel(spark, setup):
    rows, _, store = setup
    v0 = store.versions()[0]
    got = store.read_table("locations", version=v0).count()
    assert got == len(rows["locations"])


@pytest.mark.slow
def test_tag_removal_demotes_node(spark, setup):
    """src/update.cpp:60-62: a modify with empty tags keeps the location
    but drops the payload row."""
    rows, _, store = setup
    nid = rows["nodes"][0][0]
    batch = [
        (
            9,
            "modify",
            "node",
            nid,
            True,
            123,
            456,
            None,
            None,
            {},
            (999, None, 1, 1, "u"),
        )
    ]
    chg = spark.createDataFrame(batch, schemas.CHANGES_SCHEMA)
    result = apply_changes(store.read_all(), chg)
    assert result.tables["locations"].where(F.col("id") == nid).count() == 1
    assert result.tables["nodes"].where(F.col("id") == nid).count() == 0
