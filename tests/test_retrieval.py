"""BM25 retrieval (operators/retrieval.py): ranking semantics + the
zero-shuffle plan contract. Engine-vs-DuckDB bit-parity is covered by
tests/test_oracle_parity.py::q_bm25_topk."""

from __future__ import annotations

import pytest

from osmexpress_spark.operators import retrieval


from conftest import assert_no_key_exchange  # noqa: E402

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
    assert_no_key_exchange(plan, allow_single_partition=True)
    assert "PythonUDF" not in plan


# --- persisted BM25 index store ----------------------------------------------
def _docs(spark):
    rows = [
        (1, "spark joins the hash table"),
        (2, "hash hash hash everywhere"),
        (3, "nothing relevant here at all"),
        (4, "join the spark hash join club today"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_bm25_index_store_bit_identical_to_inline(spark):
    import tempfile

    d = _docs(spark)
    store = tempfile.mkdtemp(prefix="bm25_idx_t_")
    retrieval.save_bm25_index(d, store)
    for terms in (["hash", "join", "spark"], ["hash", "zzz_absent"]):
        inline = retrieval.bm25_topk(d, terms, k=10).collect()
        fromidx = retrieval.bm25_topk_from_index(
            spark, store, terms, k=10
        ).collect()
        assert [tuple(r) for r in inline] == [tuple(r) for r in fromidx]
    # empty docs count toward avgdl in BOTH paths (stats row is
    # corpus-wide): 5 docs, not 4
    stats = spark.read.parquet(store + "/stats").collect()[0]
    assert stats.n_docs == 5


@pytest.mark.slow
def test_bm25_index_query_reads_only_its_terms(spark):
    """The postings read must carry the term filter down to the scan
    (parquet row-group pruning on the term-sorted layout) — the whole
    point of the store at 100 TB."""
    import tempfile

    d = _docs(spark)
    store = tempfile.mkdtemp(prefix="bm25_idx_p_")
    retrieval.save_bm25_index(d, store)
    q = retrieval.bm25_topk_from_index(spark, store, ["hash", "spark"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan
    # and the corpus itself is never read: only store paths appear
    assert "documents" not in plan


def test_bm25_index_meta_pinning(spark):
    import tempfile

    import pytest

    d = _docs(spark)
    store = tempfile.mkdtemp(prefix="bm25_idx_m_")
    retrieval.save_bm25_index(d, store)
    with pytest.raises(ValueError, match="built with"):
        retrieval.bm25_topk_from_index(spark, store, ["hash"], id_col="item")
    with pytest.raises(ValueError, match="non-empty"):
        retrieval.bm25_topk_from_index(spark, store, [])
