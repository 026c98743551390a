"""As-of (backward) join — a time-travel lookup operator.

Absent in the reference (SURVEY.md §2.3 notes it as the natural
extension over `metadata.timestamp`), and absent as a native Spark
operator. The naive join+filter implementation explodes to
|left| x |matching right| intermediate rows; this implementation uses
the union + sorted-window trick instead:

    tag left/right rows -> union on (key, t) -> one window sort per key
    -> last_value(right attrs, ignorenulls) fills each left row with the
    most recent right row at or before its timestamp.

Cost is one shuffle-sort of |left|+|right| — no pair blowup, skew-safe
under AQE, and the window is rows-bounded (no full-partition buffering).
Tie-breaks are total: right rows sort before left rows at equal
timestamps (<= semantics) and among themselves by `right_order` so the
result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_order: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row with a matching `on` key
    (left-outer: unmatched left rows keep NULLs):

    - direction="backward" (default): the LATEST right row with
      right_time <= left_time (ties on time -> highest right_order);
    - direction="forward": the EARLIEST right row with
      right_time >= left_time (ties on time -> lowest right_order).

    right_order: column making right rows totally ordered within
    (key, time) ties — required for deterministic output when right
    timestamps repeat; defaults to right_time.

    Both directions are the same one-shuffle union+window plan; only
    the side ordering at equal timestamps and the fill direction flip
    (backward: right sorts before left, last() over preceding rows;
    forward: right sorts after left, first() over following rows).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_order = right_order or right_time
    lcols = left.columns
    out_names = [prefix + c for c in right_cols]
    backward = direction == "backward"
    # equal-time eligibility: backward needs right rows to sort BEFORE
    # left (<= includes them in the preceding window); forward AFTER
    left_side, right_side = (1, 0) if backward else (0, 1)

    l_tagged = left.select(
        *lcols,
        F.lit(left_side).alias("__side"),
        F.col(left_time).alias("__t"),
        F.lit(None).cast(right.schema[right_order].dataType).alias("__ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(right_cols, out_names)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on],
        F.col(on),
        F.lit(right_side).alias("__side"),
        F.col(right_time).alias("__t"),
        F.col(right_order).alias("__ord"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    ).select(*lcols, "__side", "__t", "__ord", *out_names)

    w = Window.partitionBy(on).orderBy(
        F.col("__t").asc(), F.col("__side").asc(), F.col("__ord").asc()
    )
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = [F.last(n, ignorenulls=True).over(w).alias(n) for n in out_names]
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = [F.first(n, ignorenulls=True).over(w).alias(n) for n in out_names]
    filled = l_tagged.unionByName(r_tagged).select(
        *lcols, "__side", *fill
    )
    return filled.where(F.col("__side") == F.lit(left_side)).drop("__side")


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    band_seconds: int,
    prefix: str = "r_",
) -> DataFrame:
    """Batch band (interval-bounded range) join: every (left, right)
    pair with a matching `on` key and ``left_time < right_time <=
    left_time + band_seconds`` — the batch analog of the streaming
    interval join (streaming/watermark_ops.py).

    The naive plan is an equi-join on the key followed by a time
    filter, which explodes to |left| x |right-per-key| before
    filtering. Instead the band is BUCKETED: both sides compute
    ``floor(epoch / band_seconds)``; a qualifying right row's bucket
    can only be the left row's bucket b0 or b0+1, so the left side
    probes exactly those two (one explode to 2 rows), the join is a
    plain equi-join on (key, bucket), and the exact band predicate
    refines. Shuffle volume is 2|left| + |right| keyed rows — never
    the pair blowup — and AQE handles residual key skew. Right-side
    columns come back prefixed; both time columns survive unprefixed/
    prefixed for the refinement and the caller."""
    if band_seconds <= 0:
        raise ValueError("band_seconds must be positive")
    clash = sorted(
        {prefix + c for c in right.columns if c != on} & set(left.columns)
    )
    if clash:
        raise ValueError(
            f"band_join: prefixed right columns collide with left "
            f"columns {clash}; pass a different prefix="
        )
    b0 = F.floor(F.unix_timestamp(F.col(left_time)) / band_seconds)
    l_probe = left.select(
        *left.columns,
        F.explode(F.array(b0, b0 + 1)).alias("__b"),
    )
    r_side = right.select(
        F.col(on),
        *[
            F.col(c).alias(prefix + c)
            for c in right.columns
            if c != on
        ],
        F.floor(
            F.unix_timestamp(F.col(right_time)) / band_seconds
        ).alias("__b"),
    )
    rt = F.col(prefix + right_time)
    lt = F.col(left_time)
    return (
        l_probe.join(r_side, [on, "__b"])
        .where(
            (rt > lt)
            & (rt <= lt + F.expr(f"INTERVAL {int(band_seconds)} SECONDS"))
        )
        .drop("__b")
    )
