"""Text-analysis operators for training-data pipelines.

Beyond reference parity (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. Everything is
built-in column expressions (JVM-side, codegen-friendly) — at 100 TB a
per-row Python UDF here would dominate the whole pipeline cost.

Determinism is part of the contract: each function is expressible 1:1
in DuckDB SQL (see queries_data.py oracles), using only md5, integer
arithmetic, and rational ratios rounded at fixed precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# marker words per language for the n-gram/keyword heuristic; the
# lexicographic fallback makes the argmax total.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht"],
    "en": ["the", "a", "is", "and", "of"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "ne"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space contract; use a BPE-ish
    regex split upstream for raw corpora)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda w: w.isin(*STOPWORDS)))


def avg_token_len(text: Column) -> Column:
    """Mean token length, rounded to 4 (int/int ratio — deterministic)."""
    ws = tokens(text)
    total = F.aggregate(
        F.transform(ws, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return F.round(total.cast("double") / F.size(ws), 4)


def quality_score(text: Column) -> Column:
    """Toy quality heuristic: long-enough docs with moderate stopword
    ratio score higher. All-rational arithmetic, rounded to 4."""
    n = token_count(text)
    stop_ratio = stopword_count(text).cast("double") / n
    len_score = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(0.5 * len_score + 0.5 * (1.0 - stop_ratio), 4)


def lang_scores(text: Column) -> dict[str, Column]:
    ws = tokens(text)
    return {
        lang: F.size(F.filter(ws, lambda w: w.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(text: Column) -> Column:
    """Argmax of marker-word hit counts; ties resolve to the
    lexicographically first language (total order => oracle-matchable)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return best_lang


def fingerprint(text: Column, length: int = 16) -> Column:
    """Content fingerprint: md5 prefix of the normalized text."""
    return F.substring(F.md5(F.trim(F.lower(text))), 1, length)


def regex_tokens(text: Column) -> Column:
    """BPE-ish tokenization for raw corpora: word runs, digit runs, and
    single punctuation marks each become tokens (the pre-tokenizer
    split most BPE vocabularies assume). Pure column expressions."""
    marked = F.regexp_replace(
        text, r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])", "$1\x01"
    )
    return F.filter(
        F.transform(F.split(marked, "\x01"), F.trim), lambda tk: tk != ""
    )


def rolling_fingerprint(text: Column, k: int = 8) -> Column:
    """Sliding-window document fingerprint: the minimum hash over all
    character k-gram windows (winnowing-style; md5 stands in for the
    rolling polynomial so the oracle can reproduce it bit-for-bit).
    NULL when the text is shorter than k."""
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1))),
            lambda i: F.md5(F.substr(text, i, F.lit(k))),
        )
    )
