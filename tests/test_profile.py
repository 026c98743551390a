"""operators/profile.py: per-column stats semantics + one-scan plan."""

from __future__ import annotations

import pytest

from osmexpress_spark.operators import profile


def test_profile_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
    )
    rows = {r["column"]: r for r in profile.profile(df).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert rows["id"]["min_value"] == "1" and rows["id"]["max_value"] == "4"
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2  # NULL excluded
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"


def test_profile_is_single_aggregate_scan(spark):
    df = spark.createDataFrame([(i, str(i)) for i in range(100)], "id long, s string")
    plan = profile.profile(df)._jdf.queryExecution().executedPlan().toString()
    # the explode-unpivot keeps ONE aggregate subtree: the input is
    # scanned exactly once regardless of column count
    assert plan.count("Scan ExistingRDD") == 1


def test_profile_approx_distinct_close_to_exact(spark):
    df = spark.createDataFrame([(i % 250,) for i in range(1000)], "v long")
    exact = profile.profile(df).collect()[0]
    approx = profile.profile(df, approx_distinct=True).collect()[0]
    assert exact["n_distinct"] == 250
    assert abs(approx["n_distinct"] - 250) / 250 < 0.05  # HLL++ default rsd


def test_modality_alignment_census(spark):
    from osmexpress_spark.operators import profile as P

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4)], "doc_id long"
    )
    vecs = spark.createDataFrame(
        [(2, [0.0] * 4), (3, [0.0] * 3), (9, [0.0] * 4)],
        "vec_id long, embedding array<double>",
    )
    row = P.modality_alignment(docs, vecs, dim=4).collect()[0]
    assert tuple(row) == (4, 3, 2, 2, 1, 1)
    # dim=None skips the dim check
    row2 = P.modality_alignment(docs, vecs).collect()[0]
    assert row2["n_dim_bad"] == 0


@pytest.mark.slow
def test_profile_diff_statuses_and_tolerance(spark):
    from osmexpress_spark.operators import profile as P

    old_t = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, k string, v long"
    )
    new_t = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 21)],
        "id long, k string, v long",
    )
    old = P.profile(old_t, ["id", "k"])
    new = P.profile(new_t, ["id", "v"])
    got = {r["column"]: r["status"] for r in P.profile_diff(old, new).collect()}
    assert got == {"id": "changed", "k": "removed", "v": "added"}
    # identical profiles diff to empty
    assert P.profile_diff(old, P.profile(old_t, ["id", "k"])).count() == 0
    # tolerance: 2 -> 3 rows is a 500-permille move; tol 600 absorbs the
    # count change, but id's max_value string still differs -> 'changed'
    loose = {
        r["column"]: r["status"]
        for r in P.profile_diff(old, new, rel_tolerance_permille=600).collect()
    }
    assert loose["id"] == "changed"  # max 2 -> 3 compares exactly
    import pytest as _p

    with _p.raises(ValueError, match="nonnegative"):
        P.profile_diff(old, new, rel_tolerance_permille=-1)
