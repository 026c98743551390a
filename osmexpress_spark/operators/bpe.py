"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

A training-data pipeline that ships tokens (not text) to the trainer
needs the tokenizer itself learned from the corpus. Byte-pair encoding
training is an iterative argmax — count adjacent symbol pairs, merge
the most frequent, repeat — which maps onto Spark as a driver loop of
bounded jobs over the VOCABULARY, not the corpus:

1. one map-side-combined aggregation folds the corpus to (word, cnt)
   — the only job that ever touches corpus text;
2. each merge iteration counts adjacent pairs with an explode over
   `arrays_zip(slice(syms,1,n-1), slice(syms,2,n-1))` weighted by word
   count (map-side combine; the shuffle carries at most one partial row
   per distinct pair per task) and takes the argmax with a
   TakeOrdered(1) — a single driver-bound row per iteration;
3. the winning pair is applied to every word's symbol array with a
   JVM-side `F.aggregate` left fold (merge-last-when-pair-matches,
   which is exactly the leftmost-nonoverlapping greedy scan) — no
   Python in the loop.

Tie-break is deterministic and documented: highest count, then
lexicographically smallest (a, b) — the pure-Python model in
tests/test_round5_ops.py implements the identical rule, so learned
merge tables are comparable bit-for-bit.

Scale shape: after step 1 the working set is vocabulary-sized (tens of
millions of rows at web scale, each a short symbol array), so the
per-merge cost is independent of corpus size; lineage is truncated
with localCheckpoint every few merges so the fold stack never deepens
past a bound. Encoding (`bpe_encode`) is the one sanctioned Python
step: a rank-dict greedy merge per word is data-dependent branching
that SQL folds can't express per-merge-table, so it runs as an
Arrow-batched mapInPandas with a bounded per-partition word cache —
never row-at-a-time Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker symbol (its own final symbol)

# truncate the fold lineage every this many merges (same device as the
# pagerank/closure iteration loops)
_CHECKPOINT_EVERY = 8

# encoder word-cache bound per partition (distinct segmentations kept;
# ~100 bytes each -> <=~25 MB of Python-worker memory)
_ENCODE_CACHE_MAX = 262_144


def word_counts(df: DataFrame, text: Column) -> DataFrame:
    """(word, cnt) vocabulary of a whitespace-tokenized corpus — the
    single corpus-sized job of BPE training (map-side-combined count).
    Empty tokens (from repeated spaces) are dropped."""
    return (
        df.select(F.explode(F.split(text, " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(words: DataFrame, eow: str | None) -> DataFrame:
    """(syms array<string>, cnt): each word split to characters, with
    the end-of-word marker appended as its own symbol (Sennrich-style,
    so merges can learn word-final units) unless eow is None."""
    syms = F.split(F.col("word"), "")
    if eow is not None:
        syms = F.concat(syms, F.array(F.lit(eow)))
    return words.select(syms.alias("syms"), F.col("cnt"))


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(a, b, total): adjacent-pair counts weighted by word count.
    The explode emits |word|-1 rows per vocabulary entry; the groupBy
    map-side-combines, so the shuffle carries distinct pairs only."""
    n = F.size("syms")
    zipped = F.arrays_zip(
        F.slice(F.col("syms"), F.lit(1), n - 1).alias("a"),
        F.slice(F.col("syms"), F.lit(2), n - 1).alias("b"),
    )
    return (
        syms.where(n >= 2)
        .select(F.explode(zipped).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("total"))
    )


def _apply_merge(syms_col: Column, a: str, b: str) -> Column:
    """Leftmost-nonoverlapping greedy merge of adjacent (a, b) into
    a||b, as a JVM-side left fold: append each symbol, but when the
    accumulated tail is `a` and the incoming symbol is `b`, replace the
    tail with the merged symbol. Replacing the tail makes the freshly
    merged symbol ineligible as the `a` of an overlapping match —
    exactly the non-overlapping scan of reference BPE."""
    merged = a + b
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_count: int = 1,
    eow: str | None = EOW,
) -> list[tuple[str, str]]:
    """Learn up to n_merges BPE merges from a (word, cnt) vocabulary.

    Returns the ordered merge table [(a, b), ...]. Stops early when no
    pair reaches min_count. Each iteration is one bounded job: a pair
    count (vocabulary-sized, map-side combined) + TakeOrdered(1) for
    the argmax with the (count desc, a asc, b asc) tie-break; the merge
    application stays lazy/JVM-side and the lineage is truncated every
    few merges.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    syms = _initial_symbols(words, eow)
    if n_merges > 0:
        # truncate the corpus lineage BEFORE the loop: without this,
        # every iteration's collect re-runs whatever produced `words`
        # (typically the corpus-sized word count) — measured 53s for 8
        # merges at sf0.1 vs ~3s with the one-time vocabulary-sized
        # materialization (SCALING.md round 6). The periodic checkpoint
        # below then only has to bound the merge-fold expression growth.
        syms = syms.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(syms)
            .where(F.col("total") >= min_count)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms = syms.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            syms = syms.localCheckpoint()
    return merges


def bpe_segment_words(
    words: DataFrame, merges: list[tuple[str, str]], eow: str | None = EOW
) -> DataFrame:
    """(word, cnt, syms): the trained segmentation of each vocabulary
    word, by replaying the merge table in order with the same JVM-side
    fold used in training. Vocabulary-sized; useful for building the
    token vocab and for auditing what the merges learned.

    The replay materializes the vocabulary once up front and truncates
    lineage every _CHECKPOINT_EVERY merges — the same discipline as
    the training loop: an n-merge replay as ONE n-deep nested
    `F.aggregate` expression overflows codegen and re-runs the
    corpus-sized word count per action (measured 22s -> ~5s for the
    q_bpe_token_census gate at sf0.1)."""
    out = words.select(
        "word", "cnt",
        _initial_symbols_col(F.col("word"), eow).alias("syms"),
    )
    if merges:
        out = out.localCheckpoint()
    for k, (a, b) in enumerate(merges):
        out = out.select(
            "word", "cnt", _apply_merge(F.col("syms"), a, b).alias("syms")
        )
        if (k + 1) % _CHECKPOINT_EVERY == 0:
            out = out.localCheckpoint()
    return out


def _initial_symbols_col(word: Column, eow: str | None) -> Column:
    syms = F.split(word, "")
    if eow is not None:
        syms = F.concat(syms, F.array(F.lit(eow)))
    return syms


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text: Column,
    merges: list[tuple[str, str]],
    eow: str | None = EOW,
) -> DataFrame:
    """(id, tokens array<string>): encode documents with a trained
    merge table; the id column keeps its input type. The rank-dict
    greedy algorithm (always merge the lowest-rank adjacent pair
    present) is data-dependent branching per word, so this is the
    sanctioned Arrow path: mapInPandas with a bounded per-partition
    word cache (capped at _ENCODE_CACHE_MAX entries; past the cap,
    unseen words are segmented without being stored, so Python-worker
    memory stays bounded at web-scale vocabularies) — each cached word
    is segmented once, and the merge table broadcasts by closure."""
    if id_col in ("tokens", "_t"):
        raise ValueError(
            "id_col must not be 'tokens' (the output column) or '_t' "
            "(the internal text alias); rename the id column first"
        )
    ranks = {pair: i for i, pair in enumerate(merges)}
    marker = eow

    def seg(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + ([marker] if marker is not None else [])
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            a, b = merges[best[0]]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        if len(cache) < _ENCODE_CACHE_MAX:
            cache[word] = syms
        return syms

    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
        ]
    )
    prepared = df.select(F.col(id_col), text.alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks = [
                [
                    s
                    for w in (t or "").split(" ")
                    if w
                    for s in seg(w, cache)
                ]
                for t in pdf["_t"]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    return prepared.mapInPandas(run, schema)


def pair_counts(words: DataFrame, eow: str | None = EOW) -> DataFrame:
    """(a, b, total): weighted adjacent-pair counts over the initial
    character segmentation of a (word, cnt) vocabulary — the first
    training iteration's aggregation, exposed for corpus diagnostics
    and the driver contract (the full train loop is not
    SQL-expressible, but any single iteration is)."""
    return _pair_counts(_initial_symbols(words, eow))


def bpe_fertility(
    df: DataFrame,
    id_col: str,
    text: Column,
    merges: list[tuple[str, str]],
    group: Column,
    eow: str | None = EOW,
) -> DataFrame:
    """Tokenizer-evaluation census per group (language, source):
    ``(group, n_docs, n_words, n_tokens, n_chars)`` — the integer
    sufficient statistics from which fertility (tokens/word) and
    compression (chars/token) derive. This is the table that says
    whether a trained vocabulary under-serves a language (fertility
    creeping toward characters-per-word means its merges never fire)
    BEFORE a trainer pays for the imbalance. Rationals stay with the
    caller (the no-rounded-rational rule).

    Plan: the Arrow-batched encode (bpe_encode's bounded-cache
    mapInPandas — the one sanctioned Python stage) feeds a broadcast
    join back to the group column and one map-side-combined aggregate;
    output is |groups| rows."""
    keyed = df.select(
        F.col(id_col),
        text.alias("_ft_text"),
        group.alias("grp"),
    )
    enc = bpe_encode(keyed, id_col, F.col("_ft_text"), merges, eow)
    joined = keyed.join(enc, id_col)
    words = F.filter(
        F.split(F.col("_ft_text"), " "), lambda w: F.length(w) > 0
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words)).alias("n_words"),
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.sum(F.length("_ft_text")).alias("n_chars"),
        )
        .withColumnRenamed("grp", "group")
    )
