"""Edge tables must exactly mirror the forward arrays (the invariant
the reference maintains imperatively at src/update.cpp:116-125,189-212;
FIXTURES.md 'Derived edge tables')."""

from __future__ import annotations

import pytest

from osmexpress_spark import testing
from osmexpress_spark.operators import edges as edges_mod


@pytest.fixture(scope="module")
def dfs(spark):
    return testing.to_dataframes(spark, testing.generate(n_nodes=300, seed=7))


def test_node_way_mirrors_forward(dfs):
    rows = dfs["ways"].collect()
    exp = {(n, w.id) for w in rows for n in set(w.nodes)}
    got = {(r.node_id, r.way_id) for r in edges_mod.node_way(dfs["ways"]).collect()}
    assert got == exp


@pytest.mark.parametrize(
    "fn,typ,col",
    [
        (edges_mod.node_relation, "node", "node_id"),
        (edges_mod.way_relation, "way", "way_id"),
        (edges_mod.relation_relation, "relation", "child_id"),
    ],
)
@pytest.mark.slow
def test_member_edges_mirror_forward(dfs, fn, typ, col):
    rows = dfs["relations"].collect()
    exp = {(m.ref, r.id) for r in rows for m in r.members if m.type == typ}
    got = {(getattr(e, col), e.relation_id) for e in fn(dfs["relations"]).collect()}
    assert got == exp
