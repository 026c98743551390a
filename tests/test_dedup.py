"""Dedup operator contracts: minhash empty-doc consistency, jaccard
stop-shingle capping, simhash block probing, closure probe caching."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from osmexpress_spark.operators import closure, dedup


@pytest.mark.slow
def test_minhash_forms_agree_on_empty_docs(spark):
    """Column form gives NULL, df form omits the doc — the two
    advertised-equivalent forms agree that a doc with < k words has no
    signature (ADVICE round 1)."""
    df = spark.createDataFrame(
        [(1, "single"), (2, "two words here"), (3, "a b")],
        "id long, text string",
    )
    col_form = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", dedup.minhash_signature(F.col("text"), 4, k=2).alias("sig")
        ).collect()
    }
    assert col_form[1] is None
    assert col_form[2] is not None and None not in col_form[2]
    df_form = dedup.minhash_signatures_df(df, "id", "text", 4, k=2)
    assert {r["id"] for r in df_form.collect()} == {2, 3}
    # and the values agree between forms
    for r in df_form.collect():
        assert col_form[r["id"]] == [r[f"h{p}"] for p in range(4)]


@pytest.mark.slow
def test_jaccard_stop_shingle_cap_bounds_pairs(spark):
    """An adversarial ubiquitous shingle must not quadratically explode
    the bucket: with the cap, only pairs sharing RARE shingles
    survive the inverted index."""
    n = 60
    # every doc shares the boilerplate bigram 'common footer'; docs 2i
    # and 2i+1 additionally share a rare bigram
    rows = [
        (i, f"common footer rare{i // 2} token{i // 2}", "b")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, bucket string")
    uncapped = dedup.jaccard_pairs(
        df, "doc_id", "text", ["bucket"], k=2, threshold=0.01
    )
    # boilerplate alone creates O(n^2) candidate pairs
    assert uncapped.count() == n * (n - 1) // 2
    capped = dedup.jaccard_pairs(
        df, "doc_id", "text", ["bucket"], k=2, threshold=0.01,
        max_shingle_freq=5,
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(n // 2)}


@pytest.mark.slow
def test_simhash_candidates_finds_near_dups_only(spark):
    # simhash with k=1 hashes the DISTINCT token set: reordering and
    # duplicating words is the near-dup class it catches exactly
    # (hamming 0); a disjoint vocabulary lands far beyond hamming 3
    texts = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "near the river the lazy dog the quick brown fox jumps over over"),
        (3, "completely different content about spark physical plans today"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_candidates(df, "doc_id", "text", k=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


@pytest.mark.slow
def test_closure_edge_probe_cached_per_dataset(spark, tmp_path):
    """Repeated closures over the same edge table run ONE probe job
    (round 1 re-pulled up to 1M edges per call)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "src long, dst long"
    )
    path = str(tmp_path / "edges")
    edges.write.parquet(path)
    closure.clear_probe_cache()
    before = closure._edge_probe_jobs
    for _ in range(3):
        e = spark.read.parquet(path)  # same plan -> same semanticHash
        seeds = spark.createDataFrame([(0,)], "id long")
        out = closure.transitive_closure(seeds, e, "src", "dst")
        assert out.count() == 101
    assert closure._edge_probe_jobs == before + 1


def test_dup_clusters_chain_diamond_and_singletons(spark):
    """Min-label propagation finds components across a 4-chain (diameter
    3 — needs multiple propagation rounds), a triangle, and an isolated
    pair; ids absent from pairs don't appear."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                     # pair
        "id_a long, id_b long",
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_dedup_survivors_keeps_representatives_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 4, 10, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = {r["doc_id"] for r in dedup.dedup_survivors(docs, pairs, "doc_id").collect()}
    # 1 survives (representative of {1,2,3}); 4, 10, 99 untouched
    assert got == {1, 4, 10, 99}


@pytest.mark.slow
def test_dup_clusters_distributed_loop_matches_driver_path(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    fast = {(r["id"], r["cluster_id"])
            for r in dedup.dup_clusters(pairs).collect()}
    loop = {(r["id"], r["cluster_id"])
            for r in dedup.dup_clusters(pairs, driver_max_pairs=0).collect()}
    assert fast == loop == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


@pytest.mark.slow
def test_dup_clusters_warns_on_non_convergence(spark):
    """A 5-chain has eccentricity 4, so one propagation round cannot
    settle it: the distributed loop must WARN rather than silently
    return incomplete cluster ids (ADVICE r03)."""
    import warnings

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        dedup.dup_clusters(
            pairs, max_iterations=1, driver_max_pairs=None
        ).collect()
    # and the converged loop stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {
            (r["id"], r["cluster_id"])
            for r in dedup.dup_clusters(pairs, driver_max_pairs=None).collect()
        }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)}


@pytest.mark.slow
def test_minhash_bucket_cap_bounds_hot_buckets(spark):
    """200 identical docs share every band bucket (the mass-boilerplate
    regime): uncapped yields ~200^2/2 pairs, the cap sheds them while
    distinct near-dups under the cap still pair up."""
    rows = [(i, "the same boilerplate text everywhere") for i in range(200)]
    rows += [(1000, "unique alpha beta gamma delta"),
             (1001, "unique alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(df, "doc_id", "text").count()
    capped = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", max_bucket_size=10
    ).collect()
    assert uncapped >= 200 * 199 // 2
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(1000, 1001)}


@pytest.mark.slow
def test_dup_clusters_fast_path_matches_loop_on_random_graphs(spark):
    """Property: union-find fast path == distributed min-label loop ==
    brute-force reference, on randomized pair graphs."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = rng.randrange(5, 40)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(1, 60))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        # brute-force reference: repeated relaxation to fixpoint
        ids = sorted({x for p in pairs for x in p})
        lbl = {x: x for x in ids}
        changed = True
        while changed:
            changed = False
            for a, b in pairs:
                m = min(lbl[a], lbl[b])
                if lbl[a] != m or lbl[b] != m:
                    lbl[a] = lbl[b] = m
                    changed = True
        expect = set(lbl.items())
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        fast = {(r["id"], r["cluster_id"])
                for r in dedup.dup_clusters(df).collect()}
        loop = {(r["id"], r["cluster_id"])
                for r in dedup.dup_clusters(df, driver_max_pairs=0).collect()}
        assert fast == expect, f"trial {trial}: fast path diverges"
        assert loop == expect, f"trial {trial}: distributed loop diverges"


def test_span_hashes_positions_and_short_docs(spark):
    from osmexpress_spark.operators.dedup import span_hashes
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x a b c")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.hs for r in df.select(
        "doc_id", span_hashes(F.col("text"), k=3).alias("hs")).collect()}
    assert len(rows[1]) == 2          # 'a b c', 'b c d'
    assert rows[2] == []              # shorter than k -> no spans
    assert len(rows[3]) == 2          # 'x a b', 'a b c'
    assert rows[1][0] == rows[3][1]   # same window text, same hash
    assert rows[1][0] != rows[1][1]


@pytest.mark.slow
def test_doc_dup_spans_counts(spark):
    from osmexpress_spark.operators.dedup import (
        doc_dup_spans, duplicated_span_stats,
    )
    df = spark.createDataFrame(
        [
            (1, "p q r s t u"),       # shares 'p q r s t' with doc 2
            (2, "p q r s t x"),
            (3, "m n o m n o m n"),   # internal repeats only -> no dups
            (4, "z z"),               # too short for k=5
        ],
        "doc_id long, text string",
    )
    stats = duplicated_span_stats(df, "doc_id", "text", k=5).collect()
    assert len(stats) == 1 and stats[0].n_docs == 2 and stats[0].n_occ == 2
    per = {r.doc_id: (r.n_spans, r.n_dup_spans)
           for r in doc_dup_spans(df, "doc_id", "text", k=5).collect()}
    assert per == {1: (2, 1), 2: (2, 1), 3: (4, 0)}  # doc 4 has no spans


@pytest.mark.slow
def test_bloom_contamination_matches_exact_path(spark):
    from osmexpress_spark.operators.dedup import (
        bloom_build, bloom_might_contain, contamination_pairs,
        contamination_pairs_bloom,
    )
    docs = [(i, f"w{i} common token stream x{i % 7} y{i % 5} z{i % 3}")
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.where(F.col("doc_id") % 9 == 0)
    exact = sorted(map(tuple, contamination_pairs(
        df, bench, "doc_id", "text", k=2, min_common=2).collect()))
    bloom = sorted(map(tuple, contamination_pairs_bloom(
        df, bench, "doc_id", "text", k=2, min_common=2).collect()))
    assert bloom == exact and len(exact) > 0
    # superset property: every true bench hash passes its own filter
    b_inv = bench.select(F.explode(
        F.split(F.col("text"), " ")).alias("w")).select(
        F.xxhash64("w").alias("s"))
    words = bloom_build(b_inv)
    assert b_inv.where(
        ~bloom_might_contain(F.col("s"), words)).count() == 0


def test_remove_dup_spans_keeps_canonical_occurrence(spark):
    from osmexpress_spark.operators.dedup import remove_dup_spans
    df = spark.createDataFrame(
        [
            (1, "p q r s t u"),       # owns the canonical 'p q r s t'
            (2, "a p q r s t"),       # loses tokens 1..5
            (3, "m n o k l"),         # untouched
            (4, "x y"),               # too short for spans
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.clean_text, r.n_removed)
           for r in remove_dup_spans(df, "doc_id", "text", k=5).collect()}
    assert out[1] == ("p q r s t u", 0)   # canonical survives intact
    assert out[2] == ("a", 5)             # covered window deleted
    assert out[3] == ("m n o k l", 0)
    assert out[4] == ("x y", 0)


def test_remove_dup_spans_overlapping_windows_union(spark):
    from osmexpress_spark.operators.dedup import remove_dup_spans
    # doc 6 repeats doc 5's whole text shifted: overlapping duplicated
    # windows must union their covered indices, not double-count
    df = spark.createDataFrame(
        [
            (5, "a b c d e f g"),
            (6, "z a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.clean_text, r.n_removed)
           for r in remove_dup_spans(df, "doc_id", "text", k=5).collect()}
    assert out[5] == ("a b c d e f g", 0)
    assert out[6] == ("z", 7)             # indices 1..7 covered once


@pytest.mark.slow
def test_remove_dup_spans_matches_python_model_random(spark):
    """Randomized equivalence against an independent Python model of
    the canonical-occurrence semantics (tiny vocab forces heavy window
    collisions, docs straddle the k boundary)."""
    import random

    rng = random.Random(13)
    k = 3
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice("abcde")
                         for _ in range(rng.randint(1, 12))))
            for i in range(25)
        ]
        # python model
        spans = {}  # h -> list[(doc, pos)]
        toks = {d: t.split(" ") for d, t in docs}
        for d, t in docs:
            w = toks[d]
            for p in range(len(w) - k + 1):
                spans.setdefault(" ".join(w[p:p + k]), []).append((d, p))
        covered = {d: set() for d, _ in docs}
        for occ in spans.values():
            if len({d for d, _ in occ}) < 2:
                continue
            canon = min((d * 1_000_000_000 + p) for d, p in occ)
            for d, p in occ:
                if d * 1_000_000_000 + p != canon:
                    covered[d].update(range(p, p + k))
        want = {}
        for d, _ in docs:
            keep = [w for i, w in enumerate(toks[d])
                    if i not in covered[d]]
            want[d] = (" ".join(keep), len(covered[d]))

        from osmexpress_spark.operators.dedup import remove_dup_spans
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: (r.clean_text, r.n_removed)
               for r in remove_dup_spans(df, "doc_id", "text", k=k).collect()}
        assert got == want, f"trial {trial}"


def test_source_overlap_hand_model(spark):
    # A: {"a b","b c"}; B: {"b c","c d"}; C: {"x y"}; D: one word -> no
    # shingles at all (absent from sizes, so absent from the matrix)
    docs = [
        (1, "A", "a b c"),
        (2, "B", "b c d"),
        (3, "C", "x y"),
        (4, "D", "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    from osmexpress_spark.operators.dedup import source_overlap

    got = {
        (r.src_a, r.src_b): (r.n_common, r.n_a, r.n_b, r.containment)
        for r in source_overlap(df, "source", "text", k=2).collect()
    }
    assert got == {
        ("A", "B"): (1, 2, 2, 0.5),
        ("A", "C"): (0, 2, 1, 0.0),
        ("B", "C"): (0, 2, 1, 0.0),
    }


def test_source_overlap_distinct_within_source(spark):
    # the same shingle repeated inside one source counts ONCE (set
    # semantics), and identical corpora give containment 1.0
    docs = [
        (1, "A", "p q p q"),
        (2, "A", "p q"),
        (3, "B", "p q"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    from osmexpress_spark.operators.dedup import source_overlap

    [r] = source_overlap(df, "source", "text", k=2).collect()
    # A's distinct bigrams: {"p q","q p"}; B's: {"p q"}
    assert (r.src_a, r.src_b) == ("A", "B")
    assert (r.n_common, r.n_a, r.n_b) == (1, 2, 1)
    assert r.containment == 1.0


def test_source_overlap_plan_python_free(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from osmexpress_spark.operators.dedup import source_overlap

    plan = (
        source_overlap(df, "source", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_split_leakage_pairs_planted(spark):
    """Plant one near-dup pair crossing a synthetic split and one
    inside a split: only the crossing pair is reported, with its
    labels; a leakage-free corpus returns empty."""
    from osmexpress_spark.operators.dedup import split_leakage_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base, "train"),
        (2, base + " lambda", "eval"),       # cross-split near-dup
        (3, base + " mu", "train"),          # in-split near-dup of 1
        (4, "totally different words entirely here now", "eval"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, split string")
    got = split_leakage_pairs(df, "doc_id", "text", "split").collect()
    pairs = {(r.id_a, r.id_b): (r.split_a, r.split_b) for r in got}
    assert (1, 2) in pairs and pairs[(1, 2)] == ("train", "eval")
    assert (2, 3) in pairs  # eval doc 2 also collides with train doc 3
    assert (1, 3) not in pairs  # same split: not leakage
    clean = spark.createDataFrame(
        [(1, base, "train"), (4, "totally different words entirely", "eval")],
        "doc_id long, text string, split string",
    )
    assert split_leakage_pairs(clean, "doc_id", "text", "split").count() == 0


@pytest.mark.slow
def test_soft_dedup_weights_model(spark):
    """Soft dedup: cluster members carry the exact rational
    1/|cluster|; singletons pass through at 1/1; the weights sum to
    the deduplicated document count (each cluster contributes exactly
    one document's mass)."""
    from fractions import Fraction

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["cluster"], r["dup_count"],
                      r["weight_num"], r["weight_den"])
        for r in dedup.soft_dedup_weights(docs, pairs).collect()
    }
    assert len(got) == 10
    # cluster {1,2,3} -> size 3, label 1; cluster {5,6} -> size 2
    for d in (1, 2, 3):
        assert got[d] == (1, 3, 1, 3)
    for d in (5, 6):
        assert got[d] == (5, 2, 1, 2)
    for d in (0, 4, 7, 8, 9):
        assert got[d] == (d, 1, 1, 1)
    total = sum(Fraction(n, m) for _, _, n, m in got.values())
    # 5 singletons + 2 clusters = 7 documents' worth of mass
    assert total == 7


@pytest.mark.slow
def test_ngram_novelty_model(spark):
    """Novelty counts vs a hand model: distinct bigrams per doc, novel
    = absent from the reference's distinct bigram set; short docs pass
    through with (0, 0)."""
    corpus = spark.createDataFrame(
        [
            (1, "a b c"),        # bigrams {a b, b c}
            (2, "x y"),          # {x y}
            (3, "a"),            # too short -> (0, 0)
            (4, "b c b c"),      # distinct {b c, c b}
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(10, "a b z"), (11, "q r")],  # ref bigrams {a b, b z, q r}
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in dedup.ngram_novelty(corpus, ref).collect()
    }
    assert got == {
        1: (2, 1),   # 'a b' seen, 'b c' novel
        2: (1, 1),
        3: (0, 0),
        4: (2, 2),
    }


@pytest.mark.slow
def test_ngram_novelty_store_matches_inline(spark, tmp_path):
    """The persisted-store form must reproduce the inline form exactly,
    including after an append of a new reference epoch (re-distinct at
    read keeps duplicate store rows from double-counting)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    ref1 = docs.where(F.col("doc_id") % 8 == 0)
    ref2 = docs.where(F.col("doc_id") % 8 == 4)
    store = str(tmp_path / "shingle_store")
    dedup.save_shingle_store(ref1, store)
    inline1 = sorted(
        map(tuple, dedup.ngram_novelty(corpus, ref1).collect())
    )
    stored1 = sorted(
        map(
            tuple,
            dedup.ngram_novelty_against_store(
                corpus, spark, store
            ).collect(),
        )
    )
    assert inline1 == stored1
    # append epoch 2's shingles (overlapping epoch 1 is fine)
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
    (
        ref2.select(F.explode(dedup.shingles(F.col("text"))).alias("s"))
        .select(h.alias("h"))
        .write.mode("append")
        .parquet(store)
    )
    both = ref1.unionByName(ref2)
    inline2 = sorted(
        map(tuple, dedup.ngram_novelty(corpus, both).collect())
    )
    stored2 = sorted(
        map(
            tuple,
            dedup.ngram_novelty_against_store(
                corpus, spark, store
            ).collect(),
        )
    )
    assert inline2 == stored2
