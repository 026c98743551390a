"""Lexical retrieval over the documents corpus: BM25 top-k.

The reference engine has no text-retrieval surface; this is one of the
training-data-pipeline extensions (SURVEY.md §2.9): corpus curation
needs query-driven slicing ("find the docs about X") next to the
similarity/dedup operators, and BM25 is the standard lexical scorer.

Scale shape (the part that matters at 100 TB):
- For a SHORT query (the common case), scoring is a pure column
  expression: per-term tf via `size(filter(tokens, w -> w = term))`,
  no explode, no shuffle, no Python. The only extra work is one tiny
  corpus-stats aggregate (N, Σdl, per-term document frequencies) that
  broadcasts back as a single row — two scans total, both fully
  column-pruned and codegen'd, then a TakeOrdered top-k (no global
  sort materialization).
- For LARGE query sets, flip to the inverted-index shape (explode +
  join, exactly operators/dedup.jaccard_pairs' plan); not implemented
  here because the per-term-expression path covers the ad-hoc query
  case the engine exposes.

Determinism contract (oracle-testable): every floating-point step is a
fixed left-to-right expression over exact integer aggregates (tf, df,
N, Σdl are all ints), so Spark and DuckDB produce bit-identical
doubles — no transcendentals (the classic log-idf is replaced by the
raw idf ratio (N - df + 0.5)/(df + 0.5), which is monotone in the
log variant, so top-k sets with distinct scores are identical while
staying engine-exact).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k docs by BM25-style score for a bag of query terms.

    Output: (id_col, score DOUBLE, n_hit INT) ordered by
    (score DESC, id ASC); only docs containing >= 1 query term rank.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(query_terms)
    ws = F.split(F.col(text_col), " ")

    def tf_of(term: str) -> Column:
        # NB: a two-parameter lambda would make F.filter pass (elem, idx)
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    base = docs.select(
        F.col(id_col),
        F.size(ws).alias("dl"),
        *[tf_of(term).alias(f"tf{i}") for i, term in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs").cast("double")
    c0 = 1.0 - b  # exact float computed once; literal matches the oracle

    def term_score(i: int) -> Column:
        tf = F.col(f"tf{i}")
        idf = (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (
            F.col(f"df{i}") + F.lit(0.5)
        )
        tfc = (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(c0) + F.lit(b) * F.col("dl") / avgdl)
        )
        return idf * tfc

    score = reduce(lambda a, c: a + c, [term_score(i) for i in range(len(terms))])
    n_hit = reduce(
        lambda a, c: a + c,
        [(F.col(f"tf{i}") > 0).cast("int") for i in range(len(terms))],
    )
    return (
        scored.select(
            F.col(id_col),
            score.alias("score"),
            n_hit.alias("n_hit"),
        )
        .where(F.col("n_hit") > 0)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB SQL computing bm25_topk with the identical left-to-right
    float expression (see module docstring for why this is bit-exact)."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split({text_col}, ' '), w -> w = '{t}'))"
        f" AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    c0 = 1.0 - b
    # NB: every literal gets e0 notation — DuckDB parses bare `0.5` as
    # DECIMAL(2,1) and its decimal arithmetic rounds differently from
    # IEEE doubles (1-ulp divergence from the Spark side otherwise)
    term_scores = " + ".join(
        f"(((n_docs - df{i} + 0.5e0) / (df{i} + 0.5e0)) * "
        f"((tf{i} * {k1 + 1.0!r}e0) / "
        f"(tf{i} + {k1!r}e0 * ({c0!r}e0 + {b!r}e0 * dl / (sum_dl / CAST(n_docs AS DOUBLE))))))"
        for i in range(len(query_terms))
    )
    n_hit = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(query_terms))
    )
    return f"""
    WITH base AS (
      SELECT {id_col}, len(string_split({text_col}, ' ')) AS dl,
         {tf_cols}
      FROM {table}
    ), stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, {df_cols}
      FROM base
    )
    SELECT {id_col}, {term_scores} AS score,
           CAST({n_hit} AS INTEGER) AS n_hit
    FROM base, stats
    WHERE {n_hit} > 0
    ORDER BY score DESC, {id_col}
    LIMIT {k}
    """


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k docs by TF-IDF score — the plain-vector-space sibling of
    bm25_topk, same two-scan zero-shuffle plan (per-term tf as a column
    expression, one broadcast stats row, TakeOrdered top-k).

    score = sum_t tf_t * (N / df_t): the raw df ratio replaces log-idf
    (monotone per term, no transcendental), each term contributes one
    exact-int-operand division and multiply, and the sum folds
    left-to-right in query order — bit-identical on both engines.
    Output (id, score DOUBLE, n_hit INT) ordered by (score DESC, id)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(query_terms)
    ws = F.split(F.col(text_col), " ")

    def tf_of(term: str) -> Column:
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    base = docs.select(
        F.col(id_col),
        *[tf_of(term).alias(f"tf{i}") for i, term in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    def term_score(i: int) -> Column:
        # tf * N / df, left-to-right; df 0 => tf 0 => the 0 * inf trap
        # never fires because the term is skipped via when()
        return F.when(
            F.col(f"df{i}") > 0,
            F.col(f"tf{i}").cast("double")
            * (
                F.col("n_docs").cast("double")
                / F.col(f"df{i}").cast("double")
            ),
        ).otherwise(F.lit(0.0))

    score = reduce(lambda a, c: a + c, [term_score(i) for i in range(len(terms))])
    n_hit = reduce(
        lambda a, c: a + c,
        [(F.col(f"tf{i}") > 0).cast("int") for i in range(len(terms))],
    )
    return (
        scored.select(F.col(id_col), score.alias("score"), n_hit.alias("n_hit"))
        .where(F.col("n_hit") > 0)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def tfidf_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> str:
    """DuckDB SQL computing tfidf_topk with the identical
    left-to-right float expression."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split({text_col}, ' '), w -> w = '{t}'))"
        f" AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    term_scores = " + ".join(
        f"(CASE WHEN df{i} > 0 THEN CAST(tf{i} AS DOUBLE) * "
        f"(CAST(n_docs AS DOUBLE) / CAST(df{i} AS DOUBLE)) ELSE 0e0 END)"
        for i in range(len(query_terms))
    )
    n_hit = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(query_terms))
    )
    return f"""
    WITH base AS (
      SELECT {id_col},
         {tf_cols}
      FROM {table}
    ), stats AS (
      SELECT count(*) AS n_docs, {df_cols}
      FROM base
    )
    SELECT {id_col}, {term_scores} AS score,
           CAST({n_hit} AS INTEGER) AS n_hit
    FROM base, stats
    WHERE {n_hit} > 0
    ORDER BY score DESC, {id_col}
    LIMIT {k}
    """
