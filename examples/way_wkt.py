"""Parity with /root/reference/examples/way_wkt.cpp:34-43 — print the
WKT LINESTRING of one way (vertex order preserved, 7-decimal coords).

Usage: python examples/way_wkt.py DATASET_DIR WAY_ID
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from osmexpress_spark import functions as fn
from osmexpress_spark import get_spark
from osmexpress_spark.api import Dataset


def main(dataset: str, way_id: int) -> None:
    spark = get_spark(app_name="way_wkt")
    ds = Dataset(spark, dataset)
    out = fn.way_linestrings(
        ds.ways().where(F.col("id") == way_id), ds.locations()
    ).collect()
    print(out[0]["wkt"] if out else f"way {way_id} not found")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
