"""Deterministic sampling & mixture operators for training-data curation.

Sampling a 100 TB corpus has two hard requirements the naive
``df.sample()`` path fails:

- **Reproducibility**: ``rand()`` is seeded per-partition, so the kept
  set changes whenever the partitioning does (AQE, repartition, retry
  of a lost task recomputing a partition). Every operator here keys off
  a deterministic per-row function of the id instead — same rows kept
  on every run, every engine, every partition layout.
- **Scan-side evaluation**: rate-based sampling must be a pure column
  predicate so it executes inside the parquet scan with zero shuffle
  and composes with pushdown (a 1% sample of 100 TB should cost ~a
  scan, never a shuffle).

Two deterministic keys are used:

- ``hash_bucket``: Knuth multiplicative hash ``(id * 2654435761) %
  denom``. One multiply per row, stays in whole-stage codegen, and is
  expressible identically in ANSI SQL — the oracle-parity choice.
  (Production variant: ``xxhash64``; kept out of the contract queries
  only because DuckDB lacks it.)
- ``md5(id)`` string order: rank-based operators (reservoir, global
  shuffle) need a total order that is uniform-ish and engine-identical;
  md5-hex string comparison is both.

Scale shapes:
- ``stratified_sample`` / rate mixing — scan-side filter, zero shuffle.
- ``reservoir_per_key`` / ``domain_mix_quota`` — one hash-partition
  window per key; per-key state is the k-row heap. A dominant key
  skews the window — pre-aggregate with operators/skew.py salting if a
  stratum exceeds an executor.
- ``global_shuffle`` — the one intrinsically all-data sort in a
  training pipeline (the final example-order materialization). Runs as
  a md5-prefix-sharded window (prefix order == global order, so shard
  offsets + local ranks give exact global positions) — parallel end to
  end, no single-partition stage; do it exactly once, at the last write.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative


def hash_bucket(id_col: Column, denom: int = 10_000) -> Column:
    """Deterministic bucket in [0, denom) from a non-negative id.

    Stays exact in int64 for ids < 2^31 (id * KNUTH < 2^63); the
    driver tables' keys are far below that.
    """
    return (id_col.cast("long") * F.lit(KNUTH)) % F.lit(denom)


def hash_bucket_sql(id_expr: str, denom: int = 10_000) -> str:
    """The identical bucket in ANSI SQL (oracle side)."""
    return f"(CAST({id_expr} AS BIGINT) * {KNUTH}) % {denom}"


def sample_order(id_col: Column) -> Column:
    """Engine-portable pseudo-random total order key: md5 of the
    decimal id string."""
    return F.md5(id_col.cast("string"))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    denom: int = 10_000,
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]``,
    deterministically: bucket(id) < rate * denom. Unlisted strata are
    dropped (rate 0).

    Pure scan-side predicate — no shuffle, no RNG state, and the CASE
    over strata is a broadcast-free literal expression (strata sets are
    small by definition; a huge strata map would become a broadcast
    join against a rates dim instead).
    """
    bucket = hash_bucket(F.col(id_col), denom)
    thresh = None
    for s, r in sorted(rates.items()):
        cut = int(round(r * denom))
        thresh = (
            F.when(F.col(strata_col) == s, F.lit(cut))
            if thresh is None
            else thresh.when(F.col(strata_col) == s, F.lit(cut))
        )
    if thresh is None:
        return df.where(F.lit(False))
    return df.where(bucket < thresh.otherwise(F.lit(0)))


def reservoir_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    rank_name: str = "sample_rank",
) -> DataFrame:
    """Deterministic k-row "reservoir" per key: rank rows within each
    key by the md5 order and keep the first k. Equivalent in
    distribution to reservoir sampling but reproducible and engine-
    portable. One window (= one hash shuffle on key); state per key is
    k rows.
    """
    w = Window.partitionBy(key_col).orderBy(
        sample_order(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .where(F.col(rank_name) <= k)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    pos_name: str = "pos",
    prefix_len: int = 2,
) -> DataFrame:
    """Assign the deterministic global training-order position: rows
    sorted by (md5(id), id). The positions are EXACT global ranks, but
    no single-partition window ever runs: the md5 key is sharded on its
    first ``prefix_len`` hex chars (16^prefix_len shards), and because
    md5-hex comparison is lexicographic, every row of shard s sorts
    strictly before every row of shard s+1 — so

        global rank = (rows in shards < s) + rank within shard s.

    The per-shard counts are one cheap aggregate (tiny shuffle of
    16^prefix_len rows), prefix-summed on the driver and re-entered as
    a literal map; the ranks are a hash-partitioned window. At 100 TB
    this is one corpus scan for counts + one shuffle into 256 balanced
    shards (md5 prefixes are uniform) — the single intentional all-data
    shuffle of the pipeline, now parallel end-to-end.
    """
    key = sample_order(F.col(id_col))
    shard = F.conv(F.substring(key, 1, prefix_len), 16, 10).cast("long")
    with_shard = df.withColumn("_gs_shard", shard)
    counts = {
        r[0]: r[1]
        for r in with_shard.groupBy("_gs_shard").count().collect()
    }
    if None in counts:
        # NULL ids have no deterministic place in a total order — fail
        # loudly instead of crashing in sorted() or silently colliding
        # offsets (the count rows are already on the driver, so this
        # check is free)
        raise ValueError(
            f"global_shuffle: {counts[None]} row(s) have NULL {id_col!r}; "
            "filter or assign ids first"
        )
    offsets: dict[int, int] = {}
    acc = 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_gs_shard").orderBy(key, F.col(id_col))
    return (
        with_shard.withColumn(
            pos_name,
            (
                F.row_number().over(w).cast("long")
                + F.coalesce(
                    F.element_at(off_map, F.col("_gs_shard")), F.lit(0)
                ).cast("long")
            ).cast("int"),
        )
        .drop("_gs_shard")
        .select(pos_name, *df.columns)
    )


def domain_mix_quota(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quotas: Mapping[str, int],
    rank_name: str = "mix_rank",
) -> DataFrame:
    """Fill an exact per-domain quota (the "data mixture" step of a
    training pipeline): rank rows within each stratum by the md5 order
    and keep ``quotas[s]`` of them. Domains absent from the map
    contribute nothing. Same single-window shape as reservoir_per_key;
    the quota map is a literal CASE.
    """
    w = Window.partitionBy(strata_col).orderBy(
        sample_order(F.col(id_col)), F.col(id_col)
    )
    quota = None
    for s, q in sorted(quotas.items()):
        quota = (
            F.when(F.col(strata_col) == s, F.lit(int(q)))
            if quota is None
            else quota.when(F.col(strata_col) == s, F.lit(int(q)))
        )
    if quota is None:
        return df.withColumn(rank_name, F.lit(1)).where(F.lit(False))
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .where(F.col(rank_name) <= quota.otherwise(F.lit(0)))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    bin_name: str = "bin",
) -> DataFrame:
    """Fixed-order sequence packing (the context-window assembly step):
    documents in deterministic id order are laid end-to-end and the
    bin is the context window the document STARTS in —
    floor(running-total-before / budget).

    One global window cumsum for the contract query; the at-scale form
    applies the same expression per shard (partition by shard key,
    pack within shard) so no global sort is needed — bins are then
    (shard, bin) pairs. Sums stay exact: token totals < 2^53."""
    w = (
        Window.orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    return df.withColumn(bin_name, (prev / F.lit(budget)).cast("long"))


def train_eval_split(
    df: DataFrame,
    id_col: str,
    eval_permille: int = 50,
    denom: int = 10_000,
    split_name: str = "split",
) -> DataFrame:
    """Deterministic holdout split: the same hash bucket that drives
    stratified_sample labels each row 'train'/'eval', so the split is
    stable across runs, engines, and partitionings, and a row can
    never migrate between splits as the corpus grows (membership
    depends only on its own id). Scan-side expression, zero shuffle."""
    cut = denom - eval_permille * denom // 1000
    return df.withColumn(
        split_name,
        F.when(hash_bucket(F.col(id_col), denom) < cut, F.lit("train"))
        .otherwise(F.lit("eval")),
    )


def global_shuffle_sharded(
    df: DataFrame,
    id_col: str,
    shards: int,
    pos_name: str = "pos",
    shard_name: str = "shard",
) -> DataFrame:
    """The at-scale form of global_shuffle: rows hash into `shards`
    deterministic shards, position is assigned WITHIN the shard
    (hash-partitioned window — parallel, no global sort), and the
    training order is (shard, pos). Shard sizes are near-uniform
    (md5-derived bucket), so a reader walking shard files round-robin
    sees the same unbiased order a global sort would give, at the
    cost of one hash shuffle instead of a total-order range sort."""
    shard = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit("global_shuffle_sharded: NULL id has no deterministic "
                  "training-order position; filter or assign ids first")
        ).cast("long"),
    ).otherwise(hash_bucket(F.col(id_col), shards)).alias(shard_name)
    w = Window.partitionBy(shard_name).orderBy(
        sample_order(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn(shard_name, shard)
        .withColumn(pos_name, F.row_number().over(w))
    )


def quality_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 4,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Curriculum bucketing: NTILE over (score desc, id) — bucket 1 is
    the best n-th of the corpus. Exact-quantile contract form: the
    single global window is the same one-reducer shape as
    global_shuffle and is kept as the oracle-checkable semantics; at
    100 TB use quality_buckets_by_threshold, which replaces the global
    sort with one tiny quantile aggregate + a scan-side comparison."""
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return df.withColumn(bucket_name, F.ntile(n_buckets).over(w))


def quality_buckets_by_threshold(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    bucket_name: str = "bucket",
    relative_error: float = 0.001,
) -> DataFrame:
    """Scale path: approxQuantile thresholds (driver-side, one
    aggregate over the score column only) + a pure column-expression
    bucket assignment — no global sort, no shuffle of the corpus.
    Bucket boundaries are approximate within `relative_error` of the
    true quantiles (ties at a boundary land in the lower bucket), which
    is the standard trade at corpus scale."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.stat.approxQuantile(score_col, qs, relative_error)
    # cuts ascending; first matching when() wins: score below the i-th
    # quantile cut -> bucket n_buckets - i (1 = best, n = worst)
    bucket = None
    for i, cut in enumerate(cuts):
        cond = F.col(score_col) < F.lit(cut)
        b = F.lit(n_buckets - i)
        bucket = F.when(cond, b) if bucket is None else bucket.when(cond, b)
    bucket = F.lit(1) if bucket is None else bucket.otherwise(F.lit(1))
    return df.withColumn(bucket_name, bucket)


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    denom: int = 1_000_000,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-LM
    mixture sampler of XLM-R / mC4: sample domain d with probability
    proportional to n_d^alpha, alpha = 1/T < 1 flattening the head).
    Realized by deterministic DOWNSAMPLING only: keep-rate
    r_d = (n_d / n_min)^(alpha-1), so the smallest domain keeps
    everything and no row is ever duplicated.

    Determinism: the keep test is hash_bucket(id) < floor(r_d * denom)
    — the only float is one pow() whose floor lands on an integer
    boundary with measure-zero probability (same acceptance as the
    ln() in the DSIR micro-nat model). Plan shape: one tiny groupBy
    for the domain census, a broadcast of |domains| rows back, and a
    scan-side predicate — the corpus never shuffles.

    NULL-domain rows are EXCLUDED up front (and from the census):
    leaving them in would let a tiny phantom NULL group set n_min and
    misscale every real domain's keep-rate while the equi-join
    silently dropped the NULL rows anyway. Map NULLs to a sentinel
    domain before calling if they should participate."""
    df = df.where(F.col(domain_col).isNotNull())
    counts = df.groupBy(F.col(domain_col).alias("d")).agg(
        F.count(F.lit(1)).alias("n_d")
    )
    nmin = counts.agg(F.min("n_d").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "d",
        F.floor(
            F.pow(
                F.col("n_d").cast("double") / F.col("n_min").cast("double"),
                F.lit(float(alpha) - 1.0),
            )
            * F.lit(float(denom))
        ).cast("long").alias("cut"),
    )
    bucket = hash_bucket(F.col(id_col), denom)
    return (
        df.join(F.broadcast(rates), df[domain_col] == rates["d"])
        .where(bucket < F.col("cut"))
        .drop("d", "cut")
    )


def pack_balanced(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    bin_name: str = "bin",
) -> DataFrame:
    """Load-balanced bin assignment (LPT-style): documents sorted by
    (size desc, id) deal round-robin into ceil(total/budget) bins —
    the longest-first deal keeps per-bin loads within one max-doc of
    each other, the classic approximation of longest-processing-time
    scheduling without sequential bin state. Complements
    pack_sequences (which preserves reading order): use this when bins
    are independent training batches and balance matters more than
    contiguity.

    Contract form runs one global rank window (same documented
    single-reducer caveat as quality_buckets' exact NTILE); at scale
    apply it per shard after global_shuffle_sharded and read bins as
    (shard, bin)."""
    totals = df.agg(
        F.sum(F.col(size_col).cast("long")).alias("__tot")
    )
    w = Window.orderBy(F.desc(size_col), F.col(id_col))
    return (
        df.crossJoin(F.broadcast(totals))
        .withColumn(
            "__nbins",
            F.greatest(
                F.ceil(F.col("__tot") / F.lit(budget)), F.lit(1)
            ).cast("long"),
        )
        .withColumn(
            bin_name,
            ((F.row_number().over(w) - 1) % F.col("__nbins")).cast("long"),
        )
        .drop("__tot", "__nbins")
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    rank_name: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup 2007): priority = u / w with u the
    deterministic 48-bit md5-uniform of the id, keep the k SMALLEST
    priorities. Heavier rows draw proportionally smaller priorities,
    so inclusion probability scales with weight — the weighted
    counterpart of reservoir_per_key, reproducible and engine-exact
    (u and w are exact integers; the one division is a single IEEE op,
    and ranking ties break on id).

    Scale shape: the priority is a scan-side expression; the top-k is
    TakeOrdered (no global sort); the rank window runs AFTER the limit
    over exactly k rows. Zero-weight/null rows are excluded (their
    priority would be infinite)."""
    from .sketch import hash48

    u = hash48(F.col(id_col).cast("string"))
    pri = u.cast("double") / F.col(weight_col).cast("double")
    keep = (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("__pri"), F.col(id_col))
    return (
        keep.withColumn(rank_name, F.row_number().over(w).cast("int"))
        .drop("__pri")
    )


def priority_sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    rank_name: str = "sample_rank",
) -> DataFrame:
    """Weighted k-row sample PER KEY (the weighted sibling of
    reservoir_per_key): priority = md5-uniform(id) / weight, keep each
    key's k smallest. One window (= one hash shuffle on the key),
    state per key is k rows; zero-weight/null rows are excluded."""
    from .sketch import hash48

    pri = (
        hash48(F.col(id_col).cast("string")).cast("double")
        / F.col(weight_col).cast("double")
    )
    w = Window.partitionBy(key_col).orderBy(pri, F.col(id_col))
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn(rank_name, F.row_number().over(w).cast("int"))
        .where(F.col(rank_name) <= k)
    )


def budget_select(
    df: DataFrame,
    order_col: Column,
    weight: Column,
    budget: int,
    id_col: str,
) -> DataFrame:
    """Greedy token-budget selection (the data-mixing step that turns
    'we want the best N-billion-token subset' into rows): rank the
    corpus by (order_col DESC, id ASC) and keep every document whose
    running weight total — ITSELF INCLUDED — still fits the budget.
    Output: the selected rows + cum_w (the running total, exact
    integers). Deterministic: ties break on id, membership is a pure
    function of the data.

    Scale shape: the contract form is one global ordered window cumsum
    (the q_global_shuffle / pack_sequences shape); at 100 TB use
    budget_select_sharded — hash shards with proportional sub-budgets,
    each a parallel independent window, no global sort."""
    if budget < 0:
        raise ValueError("budget must be nonnegative")
    w = Window.orderBy(order_col.desc(), F.col(id_col))
    return (
        df.withColumn("cum_w", F.sum(weight.cast("long")).over(w))
        .where(F.col("cum_w") <= budget)
    )


def budget_select_sharded(
    df: DataFrame,
    order_col: Column,
    weight: Column,
    budget: int,
    id_col: str,
    n_shards: int = 32,
    leftover_pass: bool = False,
    frontier: int = 64,
) -> DataFrame:
    """budget_select's at-scale form: deterministic id-hash shards,
    each greedily filling budget//n_shards with its own ordered window
    — fully parallel (windows partition by shard), no global sort.
    The union never exceeds the total budget, and approximates the
    global greedy order: a shard can keep a locally-best document that
    global greedy would have cut, which is the standard trade for
    removing the global-order bottleneck. Adds shard + cum_w columns.

    Approximation bound, stated precisely (VERDICT r06 #6): each
    shard's under-fill is against its OWN ``budget // n_shards``
    sub-budget (strictly less than that shard's first rejected
    document's weight), so under a skewed weight distribution the
    UNION can under-fill the total budget by up to the SUM of those
    per-shard gaps — this does NOT bound drift from global greedy.
    ``leftover_pass=True`` recovers it: a second, bounded global
    greedy pass over each shard's next ``frontier`` rejected documents
    (<= n_shards * frontier rows — a driver-safe window, never
    corpus-sized) fills ``budget - sum(selected weights)``. After the
    pass the total under-fill is strictly less than the weight of the
    first pass-2 candidate that did not fit — the same single-document
    bound global budget_select itself has — provided the frontier was
    not exhausted (property-tested under Zipf weights in
    tests/test_sample.py). The leftover scalar is one bounded
    driver-side agg; both windows share the shard shuffle."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shard = F.pmod(
        F.abs(F.hash(F.col(id_col).cast("string"))), F.lit(n_shards)
    )
    w = Window.partitionBy("shard").orderBy(order_col.desc(), F.col(id_col))
    cum = (
        df.withColumn("shard", shard)
        .withColumn("cum_w", F.sum(weight.cast("long")).over(w))
    )
    first = cum.where(F.col("cum_w") <= budget // n_shards)
    if not leftover_pass:
        return first
    # recompute-stable across the two passes: window ranks are pure
    # functions of the data (hash shard, deterministic order)
    cum = cum.localCheckpoint()
    first = cum.where(F.col("cum_w") <= budget // n_shards)
    used = first.agg(
        F.coalesce(F.sum(weight.cast("long")), F.lit(0)).alias("u")
    ).collect()[0]["u"]
    leftover = budget - int(used)
    rejected = cum.where(F.col("cum_w") > budget // n_shards)
    wr = Window.partitionBy("shard").orderBy(
        order_col.desc(), F.col(id_col)
    )
    candidates = (
        rejected.withColumn("__fr", F.row_number().over(wr))
        .where(F.col("__fr") <= frontier)
        .drop("__fr", "cum_w")
    )
    w2 = Window.orderBy(order_col.desc(), F.col(id_col))
    second = (
        candidates.withColumn("cum_w", F.sum(weight.cast("long")).over(w2))
        .where(F.col("cum_w") <= leftover)
    )
    return first.unionByName(second)


def budget_select_by(
    df: DataFrame,
    key_col: str,
    order_col: Column,
    weight: Column,
    budgets: dict | int,
    id_col: str,
) -> DataFrame:
    """Per-group greedy token-budget selection — the data-mixing move
    "give each domain its token budget, keep the best documents within
    it": rank each key's rows by (order_col DESC, id ASC) and keep
    every row whose running weight total — itself included — fits that
    key's budget. ``budgets`` is either one int (same budget per key)
    or a {key: budget} dict (a broadcast literal; the mixture design
    is model-sized, never corpus-sized). Keys absent from a dict get
    budget 0 — an unlisted domain contributes NOTHING, loudly
    consistent with a mixture spec being exhaustive.

    Scale shape: ONE window partitioned by key (parallel across keys,
    no global sort — budget_select's single global window is the
    contract form, THIS is the mixing form); the budget lookup is a
    scan-side CASE literal. Skewed domains are windows over their own
    rows only; output adds cum_w and budget columns, all exact
    integers."""
    if isinstance(budgets, dict):
        if not budgets:
            raise ValueError("budget_select_by: empty budget dict")
        expr = None
        for k, v in sorted(budgets.items()):
            if int(v) < 0:
                raise ValueError("budgets must be nonnegative")
            cond = F.col(key_col) == F.lit(k)
            expr = F.when(cond, F.lit(int(v))) if expr is None else (
                expr.when(cond, F.lit(int(v)))
            )
        budget_col = expr.otherwise(F.lit(0)).cast("long")
    else:
        if int(budgets) < 0:
            raise ValueError("budget must be nonnegative")
        budget_col = F.lit(int(budgets)).cast("long")
    w = Window.partitionBy(key_col).orderBy(
        order_col.desc(), F.col(id_col)
    )
    return (
        df.withColumn("cum_w", F.sum(weight.cast("long")).over(w))
        .withColumn("budget", budget_col)
        .where(F.col("cum_w") <= F.col("budget"))
    )


def mix_plan(
    df: DataFrame,
    strata_col: str,
    size_col: Column,
    weights: DataFrame,
    budget: int | None = None,
) -> DataFrame:
    """Training-mix planning — the accounting step that FEEDS
    domain_mix_quota: given the corpus and a small (domain, weight)
    table of integer target weights, compute per domain how many
    tokens the target mix allocates and the repeat factor needed to
    fill it:

        target_tokens = budget * weight DIV Σweight
        epochs_ppm    = target_tokens * 1_000_000 DIV available_tokens

    ``budget=None`` reallocates the full corpus (budget = Σ available
    over the weighted domains).  ``oversampled`` flags domains that
    must repeat data (epochs_ppm > 1_000_000) — the "4 epochs of
    Wikipedia" decision made visible before training.  All integer
    floor division, bit-identical in any engine.

    Shape at scale: one map-side-combined agg to |domains| rows, the
    weights dim and the 1-row totals broadcast — nothing corpus-sized
    past the first agg.  Domains missing from ``weights`` are excluded
    from the plan AND from the default budget (inner join first)."""
    avail = df.groupBy(strata_col).agg(
        F.sum(size_col).cast("long").alias("available_tokens")
    )
    j = avail.join(F.broadcast(weights), strata_col)
    totals = j.agg(
        F.sum("weight").cast("long").alias("_tw"),
        F.sum("available_tokens").cast("long").alias("_ta"),
    )
    budget_expr = (
        f"CAST({int(budget)} AS BIGINT)" if budget is not None else "_ta"
    )
    return (
        j.crossJoin(F.broadcast(totals))
        .withColumn(
            "target_tokens", F.expr(f"{budget_expr} * weight DIV _tw")
        )
        .withColumn(
            "epochs_ppm",
            F.expr("target_tokens * 1000000 DIV available_tokens"),
        )
        .withColumn("oversampled", F.col("epochs_ppm") > 1000000)
        .select(
            strata_col,
            "available_tokens",
            "weight",
            "target_tokens",
            "epochs_ppm",
            "oversampled",
        )
    )


def quota_fill_report(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quotas: Mapping[str, int],
) -> DataFrame:
    """The mixture post-flight check: run domain_mix_quota and report,
    per REQUESTED domain, requested vs available vs achieved counts,
    the integer fill rate, and the ``underfilled`` flag (available <
    requested — the corpus cannot fill this domain's slice and the
    training mix will silently skew unless re-weighted or repeated).
    Domains requested but absent from the corpus surface as explicit
    (available=0, achieved=0) rows instead of vanishing.

    Shape at scale: two map-side-combined counts to |domains| rows
    (plus the quota selection's per-domain windows), the |quotas|-row
    spec frame joined broadcast-small — nothing corpus-sized past the
    aggregates."""
    spark = df.sparkSession
    req = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(quotas.items())],
        f"{strata_col} string, requested long",
    )
    avail = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("available")
    )
    ach = (
        domain_mix_quota(df, strata_col, id_col, quotas)
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("long").alias("achieved"))
    )
    return (
        req.join(avail, strata_col, "left")
        .join(ach, strata_col, "left")
        .withColumn(
            "available", F.coalesce(F.col("available"), F.lit(0).cast("long"))
        )
        .withColumn(
            "achieved", F.coalesce(F.col("achieved"), F.lit(0).cast("long"))
        )
        .withColumn("fill_ppm", F.expr("achieved * 1000000 DIV requested"))
        .withColumn("underfilled", F.col("available") < F.col("requested"))
        .select(
            strata_col, "requested", "available", "achieved",
            "fill_ppm", "underfilled",
        )
    )
