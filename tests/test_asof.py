"""As-of join semantics + the one-shuffle plan contract
(operators/asof.py). Engine-vs-DuckDB parity is covered by
test_oracle_parity (q_asof_join, q_asof_join_forward)."""

from __future__ import annotations

import pytest

from osmexpress_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 200), (3, "k", 50), (4, "z", 10)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [(10, "k", 100), (11, "k", 150), (12, "k", 400)],
        "rid long, k string, t long",
    )
    return left, right


@pytest.mark.slow
def test_asof_backward_and_forward_semantics(spark):
    left, right = _frames(spark)
    back = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, "k", "t", "t", ["rid"],
                           right_order="rid").collect()
    }
    # <= semantics: t=100 matches the rid at the same instant
    assert back == {1: 10, 2: 11, 3: None, 4: None}
    fwd = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, "k", "t", "t", ["rid"],
                           right_order="rid", direction="forward").collect()
    }
    # >= semantics: earliest at-or-after; t=200 -> rid 12; unmatched key NULL
    assert fwd == {1: 10, 2: 12, 3: 10, 4: None}


@pytest.mark.slow
def test_asof_is_single_shuffle(spark):
    left, right = _frames(spark)
    for direction in ("backward", "forward"):
        out = asof_join(left, right, "k", "t", "t", ["rid"],
                        right_order="rid", direction=direction)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the union+window trick: ONE hash exchange (the window
        # partitionBy), never a join pair-blowup
        assert plan.count("Exchange hashpartitioning") == 1, direction
        assert "Join" not in plan, direction
