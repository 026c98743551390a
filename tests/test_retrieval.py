"""BM25 retrieval (operators/retrieval.py): ranking semantics + the
zero-shuffle plan contract. Engine-vs-DuckDB bit-parity is covered by
tests/test_oracle_parity.py::q_bm25_topk."""

from __future__ import annotations

from osmexpress_spark.operators import retrieval


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),       # heavy on both terms
            (2, "spark filter scan"),            # one hit
            (3, "the quick brown fox"),          # no hits -> excluded
            (4, "join join spark"),              # heavy
        ],
        "doc_id long, text string",
    )
    rows = retrieval.bm25_topk(docs, ["spark", "join"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids
    assert set(ids) == {1, 2, 4}
    # docs with both terms outrank the single-hit doc
    assert ids[-1] == 2
    assert rows[0]["n_hit"] == 2


def test_bm25_plan_has_no_shuffle_before_topk(spark):
    """The scoring scan is a pure column expression: the only exchanges
    in the plan are the single-row stats aggregate + the final top-k,
    never a repartition of the corpus."""
    docs = spark.createDataFrame(
        [(i, "spark join scan") for i in range(100)], "doc_id long, text string"
    )
    plan = retrieval.bm25_topk(docs, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # allowed: Exchange SinglePartition (stats agg) + BroadcastExchange
    # (stats row); forbidden: any hash repartitioning of the corpus
    assert "Exchange hashpartitioning" not in plan
    assert "PythonUDF" not in plan
