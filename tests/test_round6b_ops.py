"""Round-6 session operator tests: drift census + PSI, MAD outliers,
winsorized stats, and RRF hybrid retrieval fusion. The contract
queries for all four run through the strict pending oracle gate in
test_oracle_parity.py; these tests pin the API-level semantics and
the edge cases the gate's fixed corpus cannot reach."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import classify, retrieval, sketch


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, v long")


# --- drift census + PSI ------------------------------------------------------


def test_drift_census_identical_snapshots(spark):
    d = _docs(spark, [(i, (i % 7 + 1) * 13) for i in range(100)])
    cen = sketch.drift_census(d, d, F.col("v"))
    rows = cen.collect()
    assert rows, "census must be non-empty"
    for r in rows:
        assert r["old_n"] == r["new_n"] > 0
        assert r["lo"] <= r["hi"]
    assert sketch.psi_drift(cen) == 0.0


def test_drift_census_disjoint_buckets(spark):
    old = _docs(spark, [(i, 4) for i in range(50)])
    new = _docs(spark, [(i, 4096) for i in range(50)])
    cen = sketch.drift_census(old, new, F.col("v"))
    rows = {r["bucket"]: r for r in cen.collect()}
    assert len(rows) == 2
    counts = sorted((r["old_n"], r["new_n"]) for r in rows.values())
    assert counts == [(0, 50), (50, 0)]
    # fully disjoint mass: PSI is large and positive
    assert sketch.psi_drift(cen) > 10.0


def test_drift_census_bounds_cover_values(spark):
    vals = [1, 2, 3, 15, 16, 17, 1000, 65535]
    d = _docs(spark, list(enumerate(vals)))
    for r in sketch.drift_census(d, d, F.col("v")).collect():
        covered = [v for v in vals if r["lo"] <= v <= r["hi"]]
        assert len(covered) * 2 == r["old_n"] + r["new_n"]


def test_psi_drift_empty_side_raises(spark):
    d = _docs(spark, [(1, 5)])
    empty = _docs(spark, []).where(F.lit(False))
    cen = sketch.drift_census(d, empty, F.col("v"))
    with pytest.raises(ValueError, match="non-empty"):
        sketch.psi_drift(cen)


def test_psi_drift_matches_hand_computation(spark):
    # one shared bucket with different shares: check the formula
    old = _docs(spark, [(i, 4) for i in range(30)] + [(100 + i, 4096) for i in range(10)])
    new = _docs(spark, [(i, 4) for i in range(10)] + [(100 + i, 4096) for i in range(30)])
    cen = sketch.drift_census(old, new, F.col("v"))
    expect = (0.75 - 0.25) * math.log(0.75 / 0.25) + (
        0.25 - 0.75
    ) * math.log(0.25 / 0.75)
    assert sketch.psi_drift(cen) == pytest.approx(expect, rel=1e-12)


# --- MAD outliers -------------------------------------------------------------


@pytest.mark.slow
def test_mad_outliers_small_known(spark):
    # values: median 10, abs devs {0,0,1,1,2,8,90} -> MAD = 1
    vals = [10, 10, 9, 11, 12, 2, 100]
    d = _docs(spark, list(enumerate(vals)))
    out = sketch.mad_outliers(d, F.col("v"), ["doc_id"], scale_num=3, scale_den=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {5, 6}  # |2-10|=8 > 3, |100-10|=90 > 3
    for r in rows.values():
        assert r["med"] == 10 and r["mad"] == 1
        assert r["abs_dev"] > 3 * r["mad"]


@pytest.mark.slow
def test_mad_outliers_zero_mad_flags_everything_off_median(spark):
    vals = [7] * 10 + [8, 6]
    d = _docs(spark, list(enumerate(vals)))
    out = sketch.mad_outliers(d, F.col("v"), ["doc_id"], scale_num=3, scale_den=1)
    assert out.count() == 2  # MAD = 0: every v != med flags


def test_mad_outliers_scale_validation(spark):
    d = _docs(spark, [(1, 5)])
    with pytest.raises(ValueError, match="scale"):
        sketch.mad_outliers(d, F.col("v"), ["doc_id"], scale_num=-1)
    with pytest.raises(ValueError, match="scale"):
        sketch.mad_outliers(d, F.col("v"), ["doc_id"], scale_den=0)


@pytest.mark.slow
def test_mad_outliers_rational_scale(spark):
    # scale 1/2: flag |v - med| * 2 > mad
    vals = [10, 10, 9, 11, 12, 2, 100]
    d = _docs(spark, list(enumerate(vals)))
    out = sketch.mad_outliers(d, F.col("v"), ["doc_id"], scale_num=1, scale_den=2)
    got = {r["doc_id"] for r in out.collect()}
    # mad=1: flags where 2*abs_dev > 1, i.e. abs_dev >= 1
    assert got == {2, 3, 4, 5, 6}


# --- winsorized stats ---------------------------------------------------------


@pytest.mark.slow
def test_winsorized_stats_clips_exactly(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", i + 1) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, v long")
    out = sketch.winsorized_stats(
        d, F.col("v"), F.col("lang"), (1, 20), (19, 20)
    ).collect()
    # n=100: lo rank ceil(100/20)=5 -> value 5; hi rank ceil(1900/20)=95 -> 95
    by_key = {r["key"]: r for r in out}
    assert set(by_key) == {"a", "b"}
    for r in out:
        assert (r["clip_lo"], r["clip_hi"]) == (5, 95)
        assert r["win_min"] >= 5 and r["win_max"] <= 95
        assert r["n"] == 50
    # clipped sum, lang a holds odd values v=1,3,...,99
    exp_a = sum(min(95, max(5, v)) for v in range(1, 101, 2))
    assert by_key["a"]["win_sum"] == exp_a


def test_winsorized_stats_inverted_quantiles_raise(spark):
    d = _docs(spark, [(i, i) for i in range(1, 50)])
    with pytest.raises(ValueError, match="exceeds"):
        sketch.winsorized_stats(
            d, F.col("v"), F.col("doc_id"), (19, 20), (1, 20)
        )


# --- RRF fusion ---------------------------------------------------------------


def _tiny_corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark join hash"),
            (1, "join join join"),
            (2, "nothing relevant here"),
            (3, "hash hash spark"),
            (4, "filler words only"),
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.7, 0.3, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    return docs, vecs


def test_rrf_fusion_both_rankers_beat_single(spark):
    docs, vecs = _tiny_corpus(spark)
    out = retrieval.rrf_fusion(
        docs, vecs, ["spark", "hash"], query_vec_id=0, k=5, k_each=3
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # docs 1 and 3 appear in both rankers' lists; doc 2/4 in neither or one
    top = out[0]
    assert top["lex_rank"] is not None and top["vec_rank"] is not None
    for r in out:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (60 + r["lex_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (60 + r["vec_rank"])
        assert r["rrf_score"] == expect
    # every fused score sorted descending, id tie-break ascending
    keys = [(-r["rrf_score"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    assert rows  # non-empty


def test_rrf_fusion_vec_only_docs_present(spark):
    docs, vecs = _tiny_corpus(spark)
    out = retrieval.rrf_fusion(
        docs, vecs, ["nothing"], query_vec_id=0, k=5, k_each=3
    ).collect()
    ids = {r["doc_id"] for r in out}
    # lexical list is only doc 2; vector list has 1, 3 (+1 more)
    assert 2 in ids and 1 in ids and 3 in ids
    vec_only = next(r for r in out if r["doc_id"] in (1, 3))
    assert vec_only["lex_rank"] is None and vec_only["vec_rank"] is not None


def test_rrf_fusion_c_validation(spark):
    docs, vecs = _tiny_corpus(spark)
    with pytest.raises(ValueError, match="positive"):
        retrieval.rrf_fusion(docs, vecs, ["spark"], query_vec_id=0, c=0)


def test_rrf_fusion_plan_has_no_python(spark):
    docs, vecs = _tiny_corpus(spark)
    plan = retrieval.rrf_fusion(
        docs, vecs, ["spark"], query_vec_id=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- HTML -> text extraction --------------------------------------------------


def test_html_strip_tag_soup_cases(spark):
    from osmexpress_spark.operators import text as TX

    cases = [
        # script containing '<' must vanish whole, not truncate at it
        ('<p>a</p><script>if (1 < 2) { alert("<b>x</b>"); }</script>b',
         "a b"),
        ('<style media="all">p > span { x: 1; }</style>hi', "hi"),
        ("<!-- <p>not content</p> -->only this", "only this"),
        ("no markup at all", "no markup at all"),
        ("<div><br/><img src='x.png'>text</div>", "text"),
        # entity order: &amp;lt; is the LITERAL string '&lt;', not '<'
        ("a &amp;lt; b &lt; c &amp; d", "a &lt; b < c & d"),
        ("x&nbsp;&nbsp;y", "x y"),
        ("  <p>  spaced \t out \n lines  </p>  ", "spaced out lines"),
        # malformed tag soup degrades, never errors
        ("<p unclosed <b>bold</b", "bold</b"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["clean"]
        for r in df.select(
            "i", TX.html_strip(F.col("html")).alias("clean")
        ).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)


def test_html_strip_sql_twin_agrees(spark):
    """html_strip_sql must produce the identical bytes through DuckDB
    for every tag-soup case — the same contract the driver gate checks
    on the fixed corpus, here on adversarial inputs."""
    import duckdb

    from osmexpress_spark.operators import text as TX

    cases = [
        '<p>a</p><script>if (1 < 2) { alert("<b>x</b>"); }</script>b',
        "a &amp;lt; b &lt; c &amp; d",
        "<p unclosed <b>bold</b",
        "<style>p{}</style><!-- x -->ok &nbsp; &#39;q&#39;",
    ]
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    got_spark = [
        r["clean"]
        for r in df.select(TX.html_strip(F.col("html")).alias("clean"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {TX.html_strip_sql('?')} AS clean", [h]
        ).fetchone()[0]
        for h in cases
    ]
    assert got_spark == got_duck


def test_html_strip_is_scan_side_only(spark):
    from osmexpress_spark.operators import text as TX

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(TX.html_strip(F.col("html")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


# --- token-budget selection ----------------------------------------------------


def test_budget_select_greedy_boundary(spark):
    from osmexpress_spark.operators import sample

    rows = [(1, 10, 100), (2, 9, 100), (3, 8, 100), (4, 7, 100)]
    d = spark.createDataFrame(rows, "doc_id long, q long, w long")
    got = sample.budget_select(
        d, F.col("q"), F.col("w"), 250, "doc_id"
    ).collect()
    # greedy by q desc: docs 1, 2 fit (100, 200); doc 3 would hit 300
    assert sorted(r["doc_id"] for r in got) == [1, 2]
    assert {r["doc_id"]: r["cum_w"] for r in got} == {1: 100, 2: 200}
    # exact-boundary inclusion: budget 300 admits doc 3
    got = sample.budget_select(d, F.col("q"), F.col("w"), 300, "doc_id")
    assert got.count() == 3
    with pytest.raises(ValueError, match="budget"):
        sample.budget_select(d, F.col("q"), F.col("w"), -1, "doc_id")


def test_budget_select_sharded_parallel_and_bounded(spark):
    from osmexpress_spark.operators import sample

    rows = [(i, i % 17, 10) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, q long, w long")
    got = sample.budget_select_sharded(
        d, F.col("q"), F.col("w"), 800, "doc_id", n_shards=8
    )
    rows_out = got.collect()
    # every shard independently honors its proportional sub-budget
    per_shard: dict = {}
    for r in rows_out:
        per_shard[r["shard"]] = max(
            per_shard.get(r["shard"], 0), r["cum_w"]
        )
    assert per_shard and all(v <= 100 for v in per_shard.values())
    # total stays within the global budget
    assert sum(10 for _ in rows_out) <= 800
    # plan: windows partition by shard -> no global single-partition sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# --- per-group drift ------------------------------------------------------------


@pytest.mark.slow
def test_drift_census_by_and_psi(spark):
    from osmexpress_spark.operators import sketch

    old = spark.createDataFrame(
        [(i, "a", 4) for i in range(20)]
        + [(i, "b", 4) for i in range(20)],
        "doc_id long, k string, v long",
    )
    new = spark.createDataFrame(
        [(i, "a", 4) for i in range(20)]          # group a: unchanged
        + [(i, "b", 4096) for i in range(20)]     # group b: fully moved
        + [(i, "c", 7) for i in range(5)],        # group c: appeared
        "doc_id long, k string, v long",
    )
    cen = sketch.drift_census_by(old, new, F.col("k"), F.col("v"))
    psi = sketch.psi_drift_by(cen)
    assert psi["a"] == 0.0
    assert psi["b"] > 10.0
    assert psi["c"] == float("inf")  # no old-side mass at all
    rows = [r for r in cen.collect() if r["key"] == "b"]
    assert sorted((r["old_n"], r["new_n"]) for r in rows) == [(0, 20), (20, 0)]


def test_psi_drift_by_group_cap(spark):
    from osmexpress_spark.operators import sketch

    cen = spark.createDataFrame(
        [(f"k{i}", 1, 1, 1) for i in range(50)],
        "key string, bucket int, old_n long, new_n long",
    )
    with pytest.raises(ValueError, match="cap"):
        sketch.psi_drift_by(cen, max_groups=10)


@pytest.mark.slow
def test_drift_census_by_drops_null_keys(spark):
    """Null keys would never equi-join in the full-outer and would
    surface as two phantom appeared/vanished groups — both sides drop
    them instead (the exact_quantiles_by rule)."""
    from osmexpress_spark.operators import sketch

    old = spark.createDataFrame(
        [(1, None, 4), (2, "a", 4)], "doc_id long, k string, v long"
    )
    new = spark.createDataFrame(
        [(3, None, 4), (4, "a", 4)], "doc_id long, k string, v long"
    )
    cen = sketch.drift_census_by(old, new, F.col("k"), F.col("v"))
    keys = {r["key"] for r in cen.collect()}
    assert keys == {"a"}
    assert sketch.psi_drift_by(cen) == {"a": 0.0}


# --- doc_dup_spans hot-hash skew guard ----------------------------------------


@pytest.mark.slow
def test_doc_dup_spans_hot_hash_cap_screens_boilerplate(spark):
    from osmexpress_spark.operators import dedup

    boiler = "all rights reserved by the"          # 6 words -> hot 5-grams
    rows = [(i, f"{boiler} unique{i} word{i} tail{i} extra{i}")
            for i in range(60)]
    # two true near-dup docs sharing a non-boilerplate window
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        r["doc_id"]: r["n_dup_spans"]
        for r in dedup.doc_dup_spans(d, "doc_id", "text").collect()
    }
    capped = {
        r["doc_id"]: r["n_dup_spans"]
        for r in dedup.doc_dup_spans(
            d, "doc_id", "text", hot_hash_cap=10
        ).collect()
    }
    # uncapped: every boilerplate doc shows dup windows; capped: the
    # 60-doc boilerplate hashes are screened scan-side
    assert uncapped[0] > 0 and capped[0] == 0
    # the genuine 2-doc duplicate window survives the cap untouched
    assert capped[100] == uncapped[100] > 0
    assert capped[101] == uncapped[101] > 0
    # denominators (n_spans) are unchanged by screening
    n_spans = {
        r["doc_id"]: r["n_spans"]
        for r in dedup.doc_dup_spans(d, "doc_id", "text").collect()
    }
    n_spans_capped = {
        r["doc_id"]: r["n_spans"]
        for r in dedup.doc_dup_spans(
            d, "doc_id", "text", hot_hash_cap=10
        ).collect()
    }
    assert n_spans == n_spans_capped


def test_doc_dup_spans_hot_hash_cap_validation(spark):
    from osmexpress_spark.operators import dedup

    d = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="screens everything"):
        dedup.doc_dup_spans(d, "doc_id", "text", hot_hash_cap=1)


# --- property pins vs independent Python models -------------------------------


def _py_bucket(v: int, sub_bits: int = 4) -> int:
    """Independent model of sketch.quantile_bucket (restated, not
    imported from the bounds helper)."""
    if v <= 0:
        return 0
    octv = v.bit_length() - 1
    sub = (v - (1 << octv)) >> max(octv - sub_bits, 0)
    return 1 + octv * (1 << sub_bits) + sub


@pytest.mark.slow
def test_property_drift_census_matches_bucket_model(spark):
    from hypothesis import given, settings, strategies as st

    from osmexpress_spark.operators import sketch

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        old = data.draw(
            st.lists(st.integers(0, 1 << 40), min_size=1, max_size=40)
        )
        new = data.draw(
            st.lists(st.integers(0, 1 << 40), min_size=1, max_size=40)
        )
        a = spark.createDataFrame(
            [(i, v) for i, v in enumerate(old)], "i long, v long"
        )
        b = spark.createDataFrame(
            [(i, v) for i, v in enumerate(new)], "i long, v long"
        )
        got = {
            r["bucket"]: (r["old_n"], r["new_n"])
            for r in sketch.drift_census(a, b, F.col("v")).collect()
        }
        model: dict = {}
        for v in old:
            k = _py_bucket(v)
            model[k] = (model.get(k, (0, 0))[0] + 1, model.get(k, (0, 0))[1])
        for v in new:
            k = _py_bucket(v)
            model[k] = (model.get(k, (0, 0))[0], model.get(k, (0, 0))[1] + 1)
        assert got == model

    run()


@pytest.mark.slow
def test_property_mad_outliers_matches_model(spark):
    from hypothesis import given, settings, strategies as st

    from osmexpress_spark.operators import sketch

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        vals = data.draw(
            st.lists(st.integers(0, 10_000), min_size=1, max_size=60)
        )
        sn = data.draw(st.integers(0, 4))
        sd = data.draw(st.integers(1, 3))
        d = spark.createDataFrame(list(enumerate(vals)), "doc_id long, v long")
        got = {
            r["doc_id"]: (r["abs_dev"], r["med"], r["mad"])
            for r in sketch.mad_outliers(
                d, F.col("v"), ["doc_id"], sn, sd
            ).collect()
        }
        sv = sorted(vals)
        med = sv[(len(sv) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        model = {
            i: (abs(v - med), med, mad)
            for i, v in enumerate(vals)
            if abs(v - med) * sd > sn * mad
        }
        assert got == model, (vals, sn, sd, med, mad)

    run()


@pytest.mark.slow
def test_property_budget_select_matches_model(spark):
    from hypothesis import given, settings, strategies as st

    from osmexpress_spark.operators import sample

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(1, 40))
        rows = [
            (i, data.draw(st.integers(0, 50)), data.draw(st.integers(1, 99)))
            for i in range(n)
        ]
        budget = data.draw(st.integers(0, 1500))
        d = spark.createDataFrame(rows, "doc_id long, q long, w long")
        got = {
            r["doc_id"]: r["cum_w"]
            for r in sample.budget_select(
                d, F.col("q"), F.col("w"), budget, "doc_id"
            ).collect()
        }
        model, cum = {}, 0
        for i, q, w in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += w
            if cum > budget:
                break
            model[i] = cum
        assert got == model, (rows, budget)

    run()


@pytest.mark.slow
def test_property_winsorized_matches_model(spark):
    from hypothesis import given, settings, strategies as st

    from osmexpress_spark.operators import sketch

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(2, 60))
        rows = [
            (i, data.draw(st.sampled_from(["a", "b"])),
             data.draw(st.integers(0, 10_000)))
            for i in range(n)
        ]
        d = spark.createDataFrame(rows, "doc_id long, k string, v long")
        got = {
            r["key"]: (r["n"], r["win_sum"], r["clip_lo"], r["clip_hi"])
            for r in sketch.winsorized_stats(
                d, F.col("v"), F.col("k"), (1, 20), (19, 20)
            ).collect()
        }
        sv = sorted(v for _, _, v in rows)
        lo = sv[(len(sv) + 19) // 20 - 1]
        hi = sv[(19 * len(sv) + 19) // 20 - 1]
        model: dict = {}
        for _, k, v in rows:
            cnt, tot = model.get(k, (0, 0))
            model[k] = (cnt + 1, tot + min(hi, max(lo, v)))
        assert got == {
            k: (c, s, lo, hi) for k, (c, s) in model.items()
        }, (rows, lo, hi)

    run()


# --- Naive Bayes train + classify ----------------------------------------------


def test_nb_separable_corpus_classifies_perfectly(spark):
    from osmexpress_spark.operators import classify

    rows = (
        [(i, "en", "the cat sat on the mat today") for i in range(20)]
        + [(100 + i, "fr", "le chat est sur le tapis aujourd hui")
           for i in range(20)]
    )
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    conf = {
        (r["label"], r["pred"]): r["n"]
        for r in classify.nb_self_confusion(
            d, "doc_id", F.col("lang"), F.col("text")
        ).collect()
    }
    assert conf == {("en", "en"): 20, ("fr", "fr"): 20}


def test_nb_predict_unseen_bucket_uses_default_mass(spark):
    from osmexpress_spark.operators import classify

    train = spark.createDataFrame(
        [(1, "a", "xx yy zz"), (2, "b", "pp qq rr")],
        "doc_id long, lang string, text string",
    )
    counts = classify.nb_token_counts(train, F.col("lang"), F.col("text"))
    priors = train.groupBy(F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # a doc made of tokens NEITHER class ever saw: both classes score
    # pure default mass; the deterministic tie-break (label asc) wins
    probe = spark.createDataFrame(
        [(9, "unseen tokens entirely")], "doc_id long, text string"
    )
    got = classify.nb_predict(
        probe, "doc_id", F.col("text"), counts, priors
    ).collect()
    assert len(got) == 1 and got[0]["pred"] == "a"


def test_nb_token_counts_drops_null_labels(spark):
    from osmexpress_spark.operators import classify

    d = spark.createDataFrame(
        [(1, None, "aa bb"), (2, "x", "aa")],
        "doc_id long, lang string, text string",
    )
    rows = classify.nb_token_counts(
        d, F.col("lang"), F.col("text")
    ).collect()
    assert {r["label"] for r in rows} == {"x"}


def test_nb_plan_is_python_free_and_broadcasts_model(spark):
    from osmexpress_spark.operators import classify

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = classify.nb_self_confusion(d, "doc_id", F.col("lang"), F.col("text"))
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the model joins broadcast-side


def _qbucket_py(v: int) -> int:
    if v <= 0:
        return 0
    octv = v.bit_length() - 1
    sub = (v - (1 << octv)) >> max(octv - 4, 0)
    return 1 + octv * 16 + sub


@pytest.mark.slow
def test_nb_reliability_matches_scored_model(spark):
    """The reliability table must equal the readout computed in plain
    Python from _nb_scored's (trusted, separately pinned) output."""
    docs = [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "the lazy dog sleeps here"),
        (3, "de", "der schnelle braune fuchs springt"),
        (4, "de", "der faule hund schlaeft hier"),
        (5, "en", "der quick dog springt"),  # mixed: hard to classify
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    counts = classify.nb_token_counts(df, F.col("lang"), F.col("text"))
    priors = df.groupBy(F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = classify._nb_scored(
        df, "doc_id", F.col("text"), counts, priors
    ).collect()
    by_id = {}
    for r in scored:
        by_id.setdefault(r.id, []).append((-r.score_micro, r.label))
    want = {}
    truth = {d: lang for d, lang, _ in docs}
    for i, scores in by_id.items():
        scores.sort()
        pred = scores[0][1]
        margin = (
            scores[1][0] - scores[0][0] if len(scores) > 1 else 0
        )
        b = _qbucket_py(margin)
        n, ok = want.get(b, (0, 0))
        want[b] = (n + 1, ok + (1 if pred == truth[i] else 0))

    got = {
        r.bucket: (r.n, r.n_correct)
        for r in classify.nb_reliability(
            df, "doc_id", F.col("lang"), F.col("text")
        ).collect()
    }
    assert got == want


def test_nb_reliability_single_class_margin_zero(spark):
    docs = [(i, "en", f"doc {i} words here") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = classify.nb_reliability(
        df, "doc_id", F.col("lang"), F.col("text")
    ).collect()
    # one class -> no runner-up -> margin 0 -> single bucket 0, all correct
    assert [(r.bucket, r.n, r.n_correct) for r in rows] == [(0, 5, 5)]


def test_nb_reliability_separable_all_correct(spark):
    docs = [
        (i, "aa", "alpha beta gamma delta") for i in range(10)
    ] + [
        (i + 10, "bb", "omega psi chi phi") for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = classify.nb_reliability(
        df, "doc_id", F.col("lang"), F.col("text")
    ).collect()
    assert sum(r.n for r in rows) == 20
    assert all(r.n_correct == r.n for r in rows)
    assert all(r.bucket > 0 for r in rows)  # separable: positive margins


@pytest.mark.slow
def test_budget_select_sharded_leftover_pass_zipf(spark):
    """VERDICT r06 #6: under a Zipf weight distribution the even
    per-shard split under-fills the total budget (a heavy shard
    exhausts its sub-budget early while a light one under-fills); the
    leftover pass must recover it to within ONE document's weight —
    the same bound global budget_select has — while never exceeding
    the budget, staying deterministic, and keeping the pass-2 window
    bounded to n_shards * frontier rows."""
    from osmexpress_spark.operators import sample

    n, budget, shards = 500, 4000, 8
    rows = [
        (i, (i * 37) % 101, int(2000 / (1 + i) ** 1.1) + 1)
        for i in range(n)
    ]
    d = spark.createDataFrame(rows, "doc_id long, q long, w long")
    base = sample.budget_select_sharded(
        d, F.col("q"), F.col("w"), budget, "doc_id", n_shards=shards
    )
    filled = sample.budget_select_sharded(
        d, F.col("q"), F.col("w"), budget, "doc_id", n_shards=shards,
        leftover_pass=True,
    )
    t_base = sum(r["w"] for r in base.collect())
    out = filled.collect()
    t_filled = sum(r["w"] for r in out)
    t_global = sum(
        r["w"]
        for r in sample.budget_select(
            d, F.col("q"), F.col("w"), budget, "doc_id"
        ).collect()
    )
    max_w = max(w for _, _, w in rows)
    # the skew is real: the plain split leaves weight on the table that
    # the pass recovers — strictly more total weight selected
    assert t_base < t_filled <= budget
    # the pass lands inside the single-document bound that global
    # greedy itself satisfies
    assert budget - t_filled < max_w
    assert budget - t_global < max_w
    # no duplicate selections across the two passes
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    # deterministic: a re-run selects the identical set
    rerun = sample.budget_select_sharded(
        d, F.col("q"), F.col("w"), budget, "doc_id", n_shards=shards,
        leftover_pass=True,
    )
    assert sorted(ids) == sorted(r["doc_id"] for r in rerun.collect())


@pytest.mark.slow
def test_quantile_ranks_and_blend_model(spark):
    """Sketch-granular quantile ranks vs a hand model: rank = count of
    rows in strictly lower buckets; blend = integer sum; rows with a
    NULL measure drop; negative measures raise."""
    from osmexpress_spark.operators import sketch

    rows = [(1, 1, 100), (2, 2, 100), (3, 100, 2), (4, 101, 1),
            (5, None, 5)]
    d = spark.createDataFrame(rows, "doc_id long, a long, b long")
    got = {
        r["doc_id"]: (r["a_rank"], r["b_rank"], r["blend_rank"])
        for r in sketch.rank_blend(
            d, {"a": F.col("a"), "b": F.col("b")}, ["doc_id"]
        ).collect()
    }
    assert 5 not in got and len(got) == 4
    # buckets at sub_bits=4: value 1 and 2 land in different buckets,
    # 100 and 101 share one (same octave/sub-bucket)
    assert got[1] == (0, 2, 2)
    assert got[2] == (1, 2, 3)
    assert got[3][0] == 2 and got[4][0] == 2       # shared bucket rank
    assert got[3] == (2, 1, 3) and got[4] == (2, 0, 2)
    import pytest as _p

    neg = spark.createDataFrame([(1, -5, 1)], "doc_id long, a long, b long")
    with _p.raises(Exception, match="nonnegative"):
        sketch.rank_blend(
            neg, {"a": F.col("a"), "b": F.col("b")}, ["doc_id"]
        ).collect()
    with _p.raises(ValueError, match="at least one"):
        sketch.quantile_ranks(d, {}, ["doc_id"])
