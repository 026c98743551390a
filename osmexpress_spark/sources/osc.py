"""OsmChange (.osc) source (operator S2) — XML diff -> CHANGES_SCHEMA.

The reference streams the gzipped XML through libosmium
(`/root/reference/src/update.cpp:272-276`); the Python example parses
it directly (`python/examples/augmented_diff.py:24-36`). OSC files are
small (minutely diffs), so a driver-side stdlib parse into a DataFrame
is the right cost model — the heavy work (the MERGE) is distributed.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from .. import schemas

ACTIONS = ("create", "modify", "delete")


def _parse_metadata(el):
    ts = el.get("timestamp")
    import datetime

    parsed = (
        datetime.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ") if ts else None
    )
    return (
        int(el.get("version", "1")),
        parsed,
        int(el.get("changeset", "0")),
        int(el.get("uid", "0")),
        el.get("user", ""),
    )


def parse_osc(path: str, seqnum: int) -> list[tuple]:
    """One .osc (optionally .gz) file -> CHANGES_SCHEMA rows."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        root = ET.parse(f).getroot()
    rows: list[tuple] = []
    for action_el in root:
        action = action_el.tag
        if action not in ACTIONS:
            continue
        visible = action != "delete"
        for el in action_el:
            typ = el.tag
            if typ not in ("node", "way", "relation"):
                continue
            lon = lat = nodes = members = None
            if typ == "node" and visible:
                lon = int(round(float(el.get("lon", "0")) * 1e7))
                lat = int(round(float(el.get("lat", "0")) * 1e7))
            if typ == "way":
                nodes = [int(nd.get("ref")) for nd in el.findall("nd")]
            if typ == "relation":
                members = [
                    (int(m.get("ref")), m.get("type"), m.get("role", ""))
                    for m in el.findall("member")
                ]
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")} or None
            rows.append(
                (
                    seqnum,
                    action,
                    typ,
                    int(el.get("id")),
                    visible,
                    lon,
                    lat,
                    nodes,
                    members,
                    tags,
                    _parse_metadata(el),
                )
            )
    return rows


def read_osc(spark: SparkSession, path: str, seqnum: int) -> DataFrame:
    return spark.createDataFrame(parse_osc(path, seqnum), schemas.CHANGES_SCHEMA)
