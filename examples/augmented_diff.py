"""Parity with /root/reference/python/examples/augmented_diff.py —
classify an OsmChange file against a snapshot, propagate indirect
modifications, and print the per-element action list with bboxes.

Usage: python examples/augmented_diff.py DATASET_DIR CHANGE.osc
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from osmexpress_spark import get_spark
from osmexpress_spark.api import Dataset


def main(dataset: str, osc: str) -> None:
    spark = get_spark(app_name="augmented_diff")
    diff = Dataset(spark, dataset).augmented_diff(osc).orderBy("type", "id")
    for r in diff.collect():
        direct = "direct" if r["direct"] else "indirect"
        print(f"{r['action']:>17} {r['type']:>8} {r['id']} ({direct})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
