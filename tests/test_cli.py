"""CLI parity surface (python -m osmexpress_spark), mirroring the
reference's `osmx expand/extract/update/query` dispatch
(/root/reference/src/cmd.cpp:38-45). Runs main() in-process against
the shared test session."""

from __future__ import annotations

import pytest

import os

from osmexpress_spark.__main__ import main
from osmexpress_spark import testing
from osmexpress_spark.api import Dataset
from osmexpress_spark.operators.extract import extract
from osmexpress_spark.sources import sink
from osmexpress_spark.spatial import Region

OSC = """<osmChange version="0.6">
<modify><node id="1" lat="10.5" lon="20.25" version="9"><tag k="name" v="moved"/></node></modify>
<delete><node id="4"/></delete>
<create><node id="999001" lat="1.0" lon="2.0" version="1"><tag k="amenity" v="new"/></node></create>
</osmChange>"""


pytestmark = pytest.mark.slow  # r12 fast tier: end-to-end
# example/CLI sweeps (~8 min of the 35-min full run) run with
# --runslow / OSMX_RUN_SLOW=1; the smoke tier keeps oracle
# parity + plan gates (VERDICT r11 #9).


def test_cli_expand_query_extract_update(spark, tmp_path, capsys):
    work = str(tmp_path)
    fx = testing.ensure_fixture_dataset(spark, f"{work}/fx", n_nodes=300, seed=7)
    res = extract(Dataset(spark, fx).tables(), Region("-90,-180,90,180", "bbox"))
    sink.write_pbf(res, f"{work}/world.pbf")

    assert main(["expand", f"{work}/world.pbf", f"{work}/ds"]) == 0
    assert main(["query", f"{work}/ds"]) == 0
    out = capsys.readouterr().out
    assert "locations: 300" in out

    assert main(["extract", f"{work}/ds", f"{work}/nyc.pbf",
                 "--bbox", "40.5,-74.3,41.0,-73.7"]) == 0
    assert os.path.getsize(f"{work}/nyc.pbf") > 0

    osc = f"{work}/c.osc"
    with open(osc, "w") as f:
        f.write(OSC)
    assert main(["update", f"{work}/ds", osc]) == 0            # dry-run
    # a dry-run must leave the dataset byte-identical: no store
    # bootstrap, no _versions dir, no duplicated data/ tree
    assert not os.path.exists(f"{work}/ds/_versions")
    assert not os.path.exists(f"{work}/ds/data")
    assert main(["query", f"{work}/ds"]) == 0
    assert "locations: 300" in capsys.readouterr().out          # unchanged

    assert main(["update", f"{work}/ds", osc, "--commit"]) == 0
    assert main(["query", f"{work}/ds", "node", "1"]) == 0      # store-aware read
    assert "moved" in capsys.readouterr().out


def test_cli_extract_stamps_latest_manifest_timestamp(spark, tmp_path, capsys):
    """After `update --commit`, extract-to-PBF stamps the CURRENT
    snapshot's replication timestamp — advanced by apply_batch from the
    batch's newest element — not the stale expand-time _metadata.json
    (reference src/extract.cpp:282-283 stamps the live snapshot)."""
    import calendar

    from osmexpress_spark.sources import pbf

    work = str(tmp_path)
    fx = testing.ensure_fixture_dataset(spark, f"{work}/fx", n_nodes=100, seed=11)
    res = extract(Dataset(spark, fx).tables(), Region("-90,-180,90,180", "bbox"))
    sink.write_pbf(res, f"{work}/world.pbf")
    assert main(["expand", f"{work}/world.pbf", f"{work}/ds"]) == 0

    osc = f"{work}/c.osc"
    with open(osc, "w") as f:
        f.write(
            '<osmChange version="0.6"><modify>'
            '<node id="1" lat="10.5" lon="20.25" version="9"'
            ' timestamp="2031-05-06T07:08:09Z"/>'
            "</modify></osmChange>"
        )
    assert main(["update", f"{work}/ds", osc, "--commit"]) == 0

    out = f"{work}/after.pbf"
    assert main(["extract", f"{work}/ds", out,
                 "--bbox=-90,-180,90,180"]) == 0
    hdr = pbf.read_header(out)
    want = calendar.timegm((2031, 5, 6, 7, 8, 9, 0, 0, 0))
    assert hdr["osmosis_replication_timestamp"] == want


def test_cli_query_missing_id_errors(spark, tmp_path, capsys):
    fx = testing.ensure_fixture_dataset(spark, str(tmp_path / "fx"), n_nodes=100, seed=3)
    assert main(["query", fx, "way"]) == 2


def test_dataset_update_and_augmented_diff_from_osc(spark, tmp_path):
    """SURVEY §3.3 embedding-API parity: Dataset.update / .augmented_diff
    accept an .osc path directly and run against the snapshot."""
    from osmexpress_spark import testing as T

    fx = T.ensure_fixture_dataset(spark, str(tmp_path / "fx"), n_nodes=200, seed=5)
    ds = Dataset(spark, fx)
    osc = str(tmp_path / "c.osc")
    with open(osc, "w") as f:
        f.write(OSC)
    res = ds.update(osc)
    locs = res.tables["locations"]
    moved = locs.where("id = 1").collect()[0]
    assert moved["lat"] == 105000000 and moved["lon"] == 202500000
    assert locs.where("id = 4").count() == 0          # deleted
    assert locs.where("id = 999001").count() == 1     # created
    d = ds.augmented_diff(osc)
    acts = {(r["type"], r["id"]): r["action"] for r in d.collect()}
    assert acts[("node", 1)] == "modify"
    assert acts[("node", 4)] == "delete"
    assert acts[("node", 999001)] == "create"


def test_cli_extract_with_geojson_region_file(spark, tmp_path, capsys):
    import json

    fx = testing.ensure_fixture_dataset(spark, str(tmp_path / "fx"), n_nodes=200, seed=5)
    region = tmp_path / "region.geojson"
    region.write_text(json.dumps({
        "type": "Polygon",
        "coordinates": [[[-74.3, 40.5], [-73.7, 40.5], [-73.7, 41.0],
                         [-74.3, 41.0], [-74.3, 40.5]]],
    }))
    out = str(tmp_path / "out")
    assert main(["extract", fx, out, "--region", str(region)]) == 0
    assert os.path.exists(os.path.join(out, "locations", "_SUCCESS"))


def test_cli_query_leaves_readonly_dataset_untouched(spark, tmp_path, capsys):
    """query/extract are pure reads: no _versions dir (or anything else)
    appears in a plain dataset dir."""
    fx = testing.ensure_fixture_dataset(spark, str(tmp_path / "fx"), n_nodes=100, seed=3)
    before = set(os.listdir(fx))
    assert main(["query", fx]) == 0
    assert set(os.listdir(fx)) == before
    assert not os.path.exists(os.path.join(fx, "_versions"))


def test_geojson_server_parity(spark, tmp_path):
    """`serve` answers the reference web_server.py URL contract:
    GET /{node|way|relation}/{id} -> GeoJSON Feature with tag
    properties; 404 on unknown ids, 400 on junk paths."""
    import json
    import threading
    import urllib.request

    from osmexpress_spark.__main__ import make_geojson_server

    fx = testing.ensure_fixture_dataset(spark, str(tmp_path / "fx"),
                                        n_nodes=150, seed=9)
    srv = make_geojson_server(spark, fx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        ds = Dataset(spark, fx)
        way = ds.ways().select("id", "nodes", "tags").limit(1).collect()[0]
        rel = ds.relations().select("id").limit(1).collect()[0]

        node_id = way["nodes"][0]
        got = json.load(urllib.request.urlopen(f"{base}/node/{node_id}"))
        assert got["type"] == "Feature"
        assert got["geometry"]["type"] == "Point"
        lon, lat = got["geometry"]["coordinates"]
        loc = ds.locations().where(f"id = {node_id}").collect()[0]
        assert abs(lon - loc["lon"] / 1e7) < 1e-9
        assert abs(lat - loc["lat"] / 1e7) < 1e-9

        got = json.load(urllib.request.urlopen(f"{base}/way/{way['id']}"))
        assert got["geometry"]["type"] == "LineString"
        assert len(got["geometry"]["coordinates"]) == len(way["nodes"])
        assert got["properties"] == dict(way["tags"] or {})

        got = json.load(urllib.request.urlopen(f"{base}/relation/{rel['id']}"))
        assert got["geometry"]["type"] == "GeometryCollection"

        import urllib.error
        for bad, code in (("/node/99999999", 404), ("/junk", 400),
                          ("/node/abc", 400)):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError(f"{bad} should fail")
            except urllib.error.HTTPError as e:
                assert e.code == code, bad
    finally:
        srv.shutdown()


def test_cli_audit_reports_and_strict_gates(spark, tmp_path, capsys):
    work = str(tmp_path)
    fx = testing.ensure_fixture_dataset(spark, f"{work}/fx", n_nodes=200, seed=7)
    # the fixture plants one dangling way ref inside a relation
    assert main(["audit", fx]) == 0
    out = capsys.readouterr().out
    assert "way_node:" in out and "relation_way:" in out
    assert "1 dangling" in out
    # strict mode gates on it
    assert main(["audit", fx, "--strict"]) == 1
