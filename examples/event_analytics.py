"""Product-analytics pass over the events stream: ordered conversion
funnel, Markov transitions, cohort retention, hourly resample, and the
one-hour click->purchase band join.

Usage: python examples/event_analytics.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators.asof import band_join  # noqa: E402
from osmexpress_spark.operators.events import (  # noqa: E402
    cohort_retention,
    funnel_stages,
    resample_counts,
    transition_counts,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="events-example", cpus="8",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from osmexpress_spark.queries import events as load_events

    ev = load_events(spark, sf_dir)

    stages = funnel_stages(ev, [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ])
    print("funnel:", sorted(
        (r["stage"], r["count"]) for r in
        stages.groupBy("stage").count().collect()
    ))
    print("top transitions:", [
        (r.prev_type, r.next_type, r.n)
        for r in transition_counts(ev).orderBy(F.desc("n")).limit(3).collect()
    ])
    print("cohort cells:", cohort_retention(ev).count())
    dense = resample_counts(ev)
    print("resampled rows:", dense.count(),
          "gaps:", dense.where("n = 0").count())
    clicks = ev.where(F.col("event_type") == "click")
    buys = ev.where(F.col("event_type") == "purchase")
    print("click->purchase pairs within 1h:",
          band_join(clicks, buys, "user_id", "ts", "ts", 3600).count())

    # dashboard pattern: aggregate the log ONCE into the rollup store,
    # then serve range/series queries from the partials alone (the
    # range read prunes to the touched day directories; appended
    # epochs fold through the same merge, no read-modify-write)
    import tempfile

    from osmexpress_spark.operators import rollup

    store = tempfile.mkdtemp(prefix="osmx_example_rollup_")
    rollup.save_rollup_store(
        ev, store, key_cols=["event_type"],
        sketch_bits=4, distinct_col="user_id",
    )
    week = rollup.rollup_range(
        spark, store, "2024-01-08", "2024-01-14", by=["event_type"]
    )
    print("week 2 by type:", sorted(
        (r["event_type"], r["n_events"], round(r["avg_value"], 2))
        for r in week.collect()
    ))
    series = rollup.rollup_series(spark, store, "2024-01-01", "2024-01-07")
    print("week 1 daily totals:", [
        (str(r["bucket"].date()), r["n_events"])
        for r in series.orderBy("bucket").collect()
    ])
    # the sketch sidecars answer p50/p99 and distinct-users from the
    # same pruned store — no raw rescan for any dashboard measure
    q = rollup.rollup_quantiles(
        spark, store, "2024-01-08", "2024-01-14", [(1, 2), (99, 100)]
    )
    print("week 2 value quantiles (cents bounds):", sorted(
        (f"{r['q_num']}/{r['q_den']}", r["lo"], r["hi"]) for r in q.collect()
    ))
    d = rollup.rollup_distinct(spark, store, "2024-01-08", "2024-01-14")
    print("week 2 distinct users:", int(d.collect()[0]["est_distinct"]))


if __name__ == "__main__":
    main()
