"""Zero-cost pipeline health metrics via DataFrame.observe.

A 100 TB curation run cannot afford a second pass just to count what
it kept: `observe` attaches aggregate metrics to the SAME action that
materializes the data — the counters ride the scan for free and are
read back on the driver after the action completes. This module wraps
the pattern for the curation pipeline's standard counters; any
map-side-combinable aggregate works.

Usage:
    obs, gated = observe_curation(docs)
    gated.write.parquet(out)          # one job
    print(obs.get)                    # {'n_rows': ..., 'n_kept': ...}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from . import text


def observe_metrics(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[Observation, DataFrame]:
    """Attach arbitrary aggregate metrics to df's next action. Returns
    (observation, df); read `observation.get` AFTER an action runs —
    it blocks until the metrics arrive."""
    if not metrics:
        raise ValueError("observe_metrics needs at least one metric")
    obs = Observation(name)
    out = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    return obs, out


def observe_curation(
    df: DataFrame, text_col: str = "text"
) -> tuple[Observation, DataFrame]:
    """The curation pipeline's standard health counters, attached to
    one pass over the corpus: rows in, Gopher-gate pass count, rows
    carrying PII matches, and total whitespace tokens. The returned
    frame is UNCHANGED (observe is a transparent node); filter on the
    gate downstream as usual."""
    c = F.col(text_col)
    return observe_metrics(
        df,
        "curation_health",
        n_rows=F.count(F.lit(1)),
        n_gate_pass=F.sum(
            F.when(text.gopher_flags(c)["keep"], 1).otherwise(0)
        ),
        n_with_pii=F.sum(F.when(text.pii_count(c) > 0, 1).otherwise(0)),
        n_tokens=F.sum(text.token_count(c).cast("long")),
    )


def observe_stream(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """Streaming twin of observe_metrics: attach per-micro-batch
    aggregate metrics to a STREAMING DataFrame. Metrics surface in
    every StreamingQueryProgress under observedMetrics[name] (and to
    any StreamingQueryListener) — the per-batch health counters
    (rows ingested, late-data heuristics, gate pass rates) without a
    second pass or a side aggregation stream. Streaming observe takes
    a plain name, not an Observation object."""
    if not metrics:
        raise ValueError("observe_stream needs at least one metric")
    return df.observe(name, *[m.alias(k) for k, m in metrics.items()])
