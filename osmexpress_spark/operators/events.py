"""Event-sequence analytics: ordered funnels and cohort retention.

Classic product-analytics operators over an (id, user, ts, type)
event stream — the workloads every warehouse bolts next to its OLAP
core. Both are pure DataFrame compositions:

- funnel: each stage is the MIN timestamp of a qualifying event
  STRICTLY AFTER the previous stage's timestamp (ordered progression,
  not mere membership), computed as one filtered aggregate per stage
  joined back on the user key. k stages = k map-side-combined
  aggregates + k-1 broadcast-or-shuffle joins on user_id; no windows,
  no per-user event sorting.
- cohort retention: users keyed by first-activity day, activity
  bucketed into integer week offsets — two aggregates and one join.

Scale shape: everything aggregates BEFORE joining (per-user rows, not
per-event), so the joins carry |users| rows regardless of event
volume; the event table is scanned once per stage with a pushed type
predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, stage) where stage = number of funnel steps completed IN
    ORDER: step i+1 counts only if a qualifying event happens strictly
    after the user's step-i completion time. Users completing zero
    steps are absent (an event stream has no roster of non-users)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.where(steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t"))
        .select("user", "t", F.lit(1).alias("stage"))
    )
    out = cur
    for i, pred in enumerate(steps[1:], start=2):
        nxt = (
            events.where(pred)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("__ts"))
            .join(cur.select("user", "t"), "user")
            .where(F.col("__ts") > F.col("t"))
            .groupBy("user")
            .agg(F.min("__ts").alias("t"))
            .select("user", "t", F.lit(i).alias("stage"))
        )
        out = out.unionByName(nxt)
        cur = nxt
    # a user's stage is the deepest stage reached
    return out.groupBy("user").agg(F.max("stage").cast("int").alias("stage"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day STRING, week_offset INT, n_users BIGINT): users
    grouped by their first-activity day; each later activity week
    (integer floor((day - cohort_day) / 7)) counts the user once.
    cohort_day is emitted as 'yyyy-MM-dd' text (engine-portable)."""
    days = events.select(
        F.col(user_col).alias("user"), F.to_date(ts_col).alias("day")
    )
    first = days.groupBy("user").agg(F.min("day").alias("c0"))
    active = (
        days.distinct()
        .join(first, "user")
        .select(
            "user",
            F.col("c0"),
            F.floor(F.datediff("day", "c0") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy(
        F.date_format("c0", "yyyy-MM-dd").alias("cohort_day"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_users"))


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov transition matrix of the event stream: (prev_type,
    next_type, n) over consecutive events per user (ordered by ts with
    id tie-break) — the input to path/attribution analysis. One window
    (= one hash shuffle on the user key) + one map-side-combined
    count; state per key is a single lag row."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    steps = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    return steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def resample_counts(
    events: DataFrame,
    bucket_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user time-spine resampling with gap fill: (user, bucket_ts,
    n) for EVERY bucket between the user's first and last event —
    zero-filled where nothing happened, the dense series every
    charting/forecasting consumer wants (sparse group-bys silently
    drop empty buckets).

    Plan: one aggregate for per-user (min, max) epochs, one
    `sequence()` explode to build the spine (rows = active span /
    bucket, not global span x users), one left join against the
    bucketed counts. The spine explode is the only row amplification
    and is proportional to the real output."""
    # floor, not cast: cast("long") truncates toward zero and diverges
    # from the oracle's floor() on pre-1970 timestamps
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    bucketed = events.select(
        F.col(user_col).alias("user"), b.alias("bucket")
    )
    counts = bucketed.groupBy("user", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    span = bucketed.groupBy("user").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = span.select(
        "user", F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    return spine.join(counts, ["user", "bucket"], "left_outer").select(
        "user",
        (F.col("bucket") * bucket_seconds).alias("bucket_epoch"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )


def trend_slopes(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-group least-squares trend slope of `val_col` over time —
    the closed-form regression every metrics dashboard fits, computed
    ENGINE-EXACTLY: x = whole minutes since the group's first event
    (exact BIGINT), y = value in millis (exact BIGINT; the 0.5-ulp
    rounding boundary cannot fire on 2-decimal inputs), and
    slope = (n*Σxy - Σx*Σy) / (n*Σx² - (Σx)²) with the four sums as
    exact BIGINTs and the two final products in DECIMAL(38,0) so
    nothing overflows before the one double division. Output
    (group, n BIGINT, slope DOUBLE millis-per-minute, rounded to 6).

    Scale shape: two map-side-combined aggregates (per-group min, then
    the moment sums) + one broadcast join of the tiny min table; no
    window, no per-row state. Groups with a single distinct minute
    (den = 0) emit NULL slope rather than dividing by zero."""
    e = events.select(
        F.col(group_col).alias("g"),
        F.unix_timestamp(F.col(ts_col)).alias("epoch"),
        F.round(F.col(val_col) * 1000).cast("long").alias("y"),
    )
    t0 = e.groupBy("g").agg(F.min("epoch").alias("t0"))
    xy = e.join(F.broadcast(t0), "g").select(
        "g", F.expr("(epoch - t0) DIV 60").alias("x"), "y"
    )
    sums = xy.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    den = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    return sums.select(
        F.col("g").alias(group_col),
        F.col("n"),
        F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("slope_milli_per_min"),
    )


def rate_spikes(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "hour",
    k: int = 3,
) -> DataFrame:
    """Event-rate anomaly flags: per (type, window) counts whose
    absolute deviation from the type's MEDIAN count exceeds ``k`` x
    the type's MAD — the robust operational alarm (a stuck producer or
    a replay storm moves the mean and stddev it would be judged by;
    median/MAD have a 50% breakdown point). Output: (event_type,
    window_start, n, med, mad) for flagged windows only.

    Engine-exact: counts are integers; both medians are LOWER medians
    selected by row_number rank (m+1) div 2 over integer sort keys —
    no interpolation, no floats anywhere, so the whole alarm sits
    behind the value-hash gate. A type where >= half the windows share
    one count has MAD 0 and flags every deviating window — the
    conventional degenerate-MAD reading.

    Scale shape: one map-side-combined count to |types| x |windows|
    rows; everything after runs on that bounded frame (two windows +
    two broadcast-sized joins). Wide time ranges cost rows, not
    scans."""
    from pyspark.sql import Window as W

    c = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc(window, F.col(ts_col)).alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("n"))

    def lower_median(frame: DataFrame, key: str, out: str) -> DataFrame:
        w = W.partitionBy("event_type").orderBy(F.col(key))
        ranked = frame.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_m", F.count(F.lit(1)).over(W.partitionBy("event_type"))
        )
        return ranked.where(
            F.col("_rn") == F.expr("(_m + 1) div 2")
        ).select("event_type", F.col(key).alias(out))

    med = lower_median(c, "n", "med")
    d = c.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = lower_median(d, "dev", "mad")
    return (
        d.join(mad, "event_type")
        .where(F.col("dev") > F.lit(k) * F.col("mad"))
        .select("event_type", "window_start", "n", "med", "mad")
    )
