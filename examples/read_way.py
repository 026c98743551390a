"""Parity with /root/reference/python/examples/read_way.py:9-23 —
look up one way, print its tags and per-node coordinates.

Usage: python examples/read_way.py DATASET_DIR WAY_ID
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from osmexpress_spark import get_spark
from osmexpress_spark.api import Dataset


def main(dataset: str, way_id: int) -> None:
    spark = get_spark(app_name="read_way")
    ds = Dataset(spark, dataset)
    way = ds.lookup("way", way_id).collect()
    if not way:
        print(f"way {way_id} not found")
        return
    print("tags:", dict(way[0]["tags"] or {}))
    verts = (
        spark.createDataFrame(
            [(i, n) for i, n in enumerate(way[0]["nodes"])], "pos int, node_id long"
        )
        .join(ds.locations().withColumnRenamed("id", "node_id"), "node_id")
        .orderBy("pos")
    )
    for r in verts.collect():
        print(f"  node {r['node_id']}: ({r['lon'] / 1e7:.7f}, {r['lat'] / 1e7:.7f})")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
