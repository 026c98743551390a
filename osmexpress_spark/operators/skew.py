"""Skew mitigation: salted two-phase aggregation and salted
replicated joins.

The reference never meets skew — its aggregation is a Roaring bitmap
union on one core (`/root/reference/src/extract.cpp:149-151`). A
distributed engine does: a handful of heavy keys (event types, hot
users, viral documents) can pin one reducer while the rest idle. Two
standard remedies, both pure DataFrame compositions:

- AQE (enabled in session defaults) splits skewed sort-merge-join and
  shuffle partitions at runtime — the zero-code path.
- This module is the *explicit* form for the cases AQE doesn't cover:
  a deterministic salt column spreads each hot key over `n_salts`
  reducers, with a second phase (agg combine / join key restore)
  folding the salt back out. Costs one extra (tiny) shuffle; wins
  whenever max-key-share >> 1/n_partitions.

Everything stays JVM-side (hash/pmod/explode built-ins) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# (partial expr builder, final combine expr builder) per supported agg.
# avg decomposes into sum+count so the two-phase combine stays exact.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    salt_on: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed `keys`.

    `aggs`: output alias -> (fn, input column) with fn in
    sum/count/min/max/avg. Phase 1 groups by (keys, salt) — hot keys
    fan out over `n_salts` reducers and benefit from map-side partial
    aggregation as usual; phase 2 combines the n_salts partials per
    key — a shuffle of |keys|*n_salts rows, i.e. negligible.
    `salt_on` must be a deterministic high-cardinality column (a row
    id); the result is then reproducible run-to-run.
    """
    salted = df.withColumn(_SALT, F.pmod(F.hash(salt_on), F.lit(n_salts)))
    partials = []
    finals = []
    for alias, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"{alias}__s"),
                F.count(col).alias(f"{alias}__c"),
            ]
            finals.append(
                (F.sum(f"{alias}__s") / F.sum(f"{alias}__c")).alias(alias)
            )
            continue
        part_fn, comb_fn = _ALGEBRAIC[fn]
        partials.append(part_fn(col).alias(f"{alias}__p"))
        finals.append(comb_fn(f"{alias}__p").alias(alias))
    phase1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot join keys and `small` is too
    big to broadcast (else just `broadcast(small)` — AQE does that
    automatically). Each skewed row gets a deterministic salt; `small`
    is replicated across all `n_salts` salt values via explode, so
    every (key, salt) reducer holds the key's small-side rows. Shuffle
    volume: |skewed| + n_salts * |small|.

    Only inner/left are supported: the small side is replicated, so a
    right/full join would emit each unmatched small-side row once per
    salt."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    left = skewed.withColumn(_SALT, F.pmod(F.hash(salt_on), F.lit(n_salts)))
    right = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [*on, _SALT], how).drop(_SALT)
