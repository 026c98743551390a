"""Parity with /root/reference/examples/bbox_wkt.cpp:49-91 — every way
intersecting a bbox as WKT LINESTRINGs (covering scan -> membership
join -> completion back-fill -> ordered assembly).

Usage: python examples/bbox_wkt.py DATASET_DIR "minLat,minLon,maxLat,maxLon"
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from osmexpress_spark import functions as fn
from osmexpress_spark import get_spark
from osmexpress_spark.api import Dataset
from osmexpress_spark.spatial import Region


def main(dataset: str, bbox: str) -> None:
    spark = get_spark(app_name="bbox_wkt")
    res = Dataset(spark, dataset).extract(Region(bbox, "bbox"))
    for r in fn.way_linestrings(res.ways, res.locations).orderBy("id").collect():
        print(r["id"], r["wkt"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
