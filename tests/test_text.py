"""Text-operator unit tests beyond the oracle-parity sweep: edge cases
the synthetic corpus never produces (non-alpha tokens, stopword-free
docs, boundary word counts)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from osmexpress_spark.operators import text


def _flags(spark, doc):
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = df.select(text.gopher_flags(F.col("text")).alias("g")).collect()[0].g
    return r.asDict()


def test_gopher_flags_all_pass(spark):
    doc = " ".join(["the", "and", "words"] + ["token"] * 20)
    g = _flags(spark, doc)
    assert g == {
        "ok_word_count": True, "ok_mean_word_len": True,
        "ok_alpha_ratio": True, "ok_stopwords": True, "keep": True,
    }


@pytest.mark.slow
def test_gopher_flags_each_rule_fires_independently(spark):
    # too short
    assert not _flags(spark, "the and tiny doc")["ok_word_count"]
    # mean word length too small (all 1-char words)
    short = " ".join(["a"] * 30)
    g = _flags(spark, short)
    assert not g["ok_mean_word_len"] and not g["keep"]
    # mean word length too large
    longw = " ".join(["the", "and"] + ["verylongtokenword"] * 28)
    assert not _flags(spark, longw)["ok_mean_word_len"]
    # alpha ratio: >20% pure-number tokens fails
    nums = " ".join(["the", "and"] + ["word"] * 16 + ["123"] * 12)
    g = _flags(spark, nums)
    assert not g["ok_alpha_ratio"] and not g["keep"]
    # no stopwords
    nostop = " ".join(["token"] * 30)
    g = _flags(spark, nostop)
    assert not g["ok_stopwords"] and not g["keep"]


def test_gopher_stopword_rule_requires_distinct_words(spark):
    # one stopword repeated twice must NOT satisfy the >=2 rule
    one_rep = " ".join(["the", "the"] + ["token"] * 20)
    g = _flags(spark, one_rep)
    assert not g["ok_stopwords"] and not g["keep"]
    two = " ".join(["the", "of"] + ["token"] * 20)
    assert _flags(spark, two)["ok_stopwords"]


def test_vocab_growth_model(spark):
    """Heaps-law census vs a hand model: first-occurrence counting by
    id-range bucket, totals per bucket, empty-bucket-safe."""
    rows = [
        (0, "a b c"),
        (1, "a b"),
        (4, "a d"),
        (5, "d e f"),
        (9, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["new_tokens"], r["total_tokens"])
        for r in text.vocab_growth(df, "text", "doc_id", n_buckets=2).collect()
    }
    # max_id 9 -> bucket = floor(id*2/10): ids 0,1,4 -> 0; 5,9 -> 1
    # bucket 0 tokens: a b c a b a d -> new {a,b,c,d}=4, total 7
    # bucket 1 tokens: d e f a -> new {e,f}=2, total 4
    assert got == {0: (4, 7), 1: (2, 4)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        text.vocab_growth(df, n_buckets=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="empty"):
        text.vocab_growth(empty)


def test_compression_stats_pinned_and_ordering(spark):
    """The zlib census: pinned against a direct zlib call (the op must
    add nothing beyond utf-8 encode + compress), boilerplate compresses
    below random-ish text, null text maps to (0, len(zlib('')))."""
    import zlib

    boiler = "spam ham " * 200
    mixed = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(1, boiler), (2, mixed), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"])
        for r in text.compression_stats(df).collect()
    }
    for i, t in rows:
        b = t.encode() if t else b""
        assert got[i] == (len(b), len(zlib.compress(b, 6))), i
    ratio = {i: got[i][1] / got[i][0] for i in (1, 2)}
    assert ratio[1] < ratio[2] < 1.0
    import pytest as _p

    with _p.raises(ValueError, match="level"):
        text.compression_stats(df, level=11)
