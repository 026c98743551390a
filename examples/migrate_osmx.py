"""Migrate an existing `.osmx` file into the engine's layout.

A user of the reference keeps their planet in a single LMDB file
(`osmx expand planet.osm.pbf planet.osmx`). This engine opens that
artifact directly — no re-expand from PBF:

    python examples/migrate_osmx.py planet.osmx ./planet_dataset

The read is distributed: key-range partitions are planned from the
top B-tree levels only (sources/lmdb_kv.LmdbReader.split_points), so
the driver never walks the data pages; each executor decodes its own
slice of the locations/ways/relations trees. Replication state
(osmosis seqnum/timestamp) migrates from the file's metadata table,
so `update` catch-up resumes from the snapshot's position.

Cell ids are re-derived from the exact lon/lat integers rather than
trusting the file's stored `cell_node` keys.  Files WE write carry
TRUE level-16 S2 ids by default (spatial/s2cell.py,
`cell_scheme=s2_16`), so the reference's region queries range-scan
our index directly; see sources/osmx.py's module docstring.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from osmexpress_spark import get_spark
from osmexpress_spark.api import Dataset
from osmexpress_spark.sources.osmx import OsmxFile


def main(src: str, dest: str) -> int:
    with OsmxFile(src) as f:
        stats = f.stats()
        print("source tables:", stats)
        print("source metadata:", f.metadata())
    spark = get_spark(app_name="osmx-migrate")
    Dataset.expand(spark, src, dest)
    ds = Dataset(spark, dest)
    for name, df in ds.tables().items():
        n = df.count()
        print(f"{name}: {n} rows migrated")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
