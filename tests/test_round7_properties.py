"""Property-based checks of the round-7 operators against independent
Python models (the SURVEY §5 strategy: small random inputs, exact
expected values from straight-line Python)."""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- budget_select_by vs per-key greedy model --------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(0, 2),       # key index -> 'k0'..'k2'
        st.integers(1, 50),      # weight
        st.integers(0, 40),      # order score
    ),
    min_size=0,
    max_size=24,
)
_budgets = st.fixed_dictionaries(
    {"k0": st.integers(0, 120), "k1": st.integers(0, 120)}
)


@SET
@given(_rows, _budgets)
@pytest.mark.slow
def test_budget_select_by_matches_model(spark, rows, budgets):
    from osmexpress_spark.operators import sample

    data = [
        (i, f"k{k}", w, q) for i, (k, w, q) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, k string, w long, q long"
    )
    got = {
        r["doc_id"]: (r["cum_w"], r["budget"])
        for r in sample.budget_select_by(
            df, "k", F.col("q"), F.col("w"), budgets, "doc_id"
        ).collect()
    }
    want = {}
    for key in {d[1] for d in data}:
        members = sorted(
            (d for d in data if d[1] == key),
            key=lambda d: (-d[3], d[0]),
        )
        b = budgets.get(key, 0)
        cum = 0
        for doc_id, _, w, _q in members:
            cum += w
            if cum <= b:
                want[doc_id] = (cum, b)
    assert got == want


# --- vocab_growth vs first-occurrence model -----------------------------------

_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
    min_size=1,
    max_size=20,
)


@SET
@given(_docs, st.integers(1, 5))
@pytest.mark.slow
def test_vocab_growth_matches_model(spark, docs, n_buckets):
    from osmexpress_spark.operators import text

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["new_tokens"], r["total_tokens"])
        for r in text.vocab_growth(
            df, "text", "doc_id", n_buckets
        ).collect()
    }
    max_id = len(docs) - 1
    first: dict[str, int] = {}
    totals: dict[int, int] = {}
    for i, ws in enumerate(docs):
        b = math.floor(i * n_buckets / (max_id + 1))
        for w in ws:
            totals[b] = totals.get(b, 0) + 1
            if w not in first or first[w] > b:
                first[w] = b
    want = {
        b: (
            sum(1 for w, fb in first.items() if fb == b),
            totals[b],
        )
        for b in totals
    }
    assert got == want


# --- ngram_novelty vs set-difference model ------------------------------------

_corpus = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=5),
    min_size=1,
    max_size=12,
)


@SET
@given(_corpus, _corpus)
@pytest.mark.slow
def test_ngram_novelty_matches_model(spark, corpus, reference):
    from osmexpress_spark.operators import dedup

    c = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    r = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(reference)],
        "doc_id long, text string",
    )
    got = {
        row["doc_id"]: (row["n_shingles"], row["n_novel"])
        for row in dedup.ngram_novelty(c, r, k=2).collect()
    }

    def bigrams(ws):
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    ref_set = set()
    for ws in reference:
        ref_set |= bigrams(ws)
    want = {}
    for i, ws in enumerate(corpus):
        sh = bigrams(ws)
        want[i] = (len(sh), len(sh - ref_set))
    assert got == want


# --- wav_segments vs frame-run model ------------------------------------------

_pcm = st.lists(
    st.sampled_from([0, 50, 1500, 20000, -20000]),
    min_size=1,
    max_size=2000,
)


@SET
@given(_pcm)
def test_wav_segments_matches_model(spark, samples):
    """Segmentation counts vs a straight-line model of the exact
    integer frame-energy rule (8 kHz mono 16-bit, 20 ms frames = 160
    samples, threshold 50 permille of full scale)."""
    from tests.test_multimodal import _wav

    from osmexpress_spark.operators import multimodal

    got = multimodal.wav_segments(_wav(samples), frame_ms=20)
    spf, full, thr = 160, 32768, 50
    frames = [
        samples[i : i + spf] for i in range(0, len(samples), spf)
    ]
    active = [
        1000 * sum(abs(s) for s in f) > thr * full * len(f)
        for f in frames
    ]
    n_seg = longest = cur = 0
    leading = len(frames)
    for i, a in enumerate(active):
        if a:
            if cur == 0:
                n_seg += 1
                leading = min(leading, i)
            cur += 1
            longest = max(longest, cur)
        else:
            cur = 0
    if not any(active):
        leading = len(frames)
    assert got == [
        float(len(frames)),
        float(sum(active)),
        float(n_seg),
        float(longest),
        float(leading),
    ]
