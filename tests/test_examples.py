"""Smoke tests pinning the examples/ scripts: each must run end-to-end
in a subprocess (fresh interpreter, the exact user entry path) against
small inputs and exit 0 with expected output markers."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")
SF = "/root/testdata/sf0.001"


pytestmark = pytest.mark.slow  # r12 fast tier: end-to-end
# example/CLI sweeps (~8 min of the 35-min full run) run with
# --runslow / OSMX_RUN_SLOW=1; the smoke tier keeps oracle
# parity + plan gates (VERDICT r11 #9).


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    from osmexpress_spark import testing

    d = str(tmp_path_factory.mktemp("exds") / "fx")
    testing.ensure_fixture_dataset(spark, d, n_nodes=200, seed=7)
    return d


def _min_way_id(spark, dataset):
    from osmexpress_spark.api import Dataset
    from pyspark.sql import functions as F

    return Dataset(spark, dataset).ways().agg(F.min("id")).collect()[0][0]


def test_example_read_way(spark, dataset):
    wid = _min_way_id(spark, dataset)
    r = _run([os.path.join(EX, "read_way.py"), dataset, str(wid)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert str(wid) in r.stdout


def test_example_way_wkt(spark, dataset):
    wid = _min_way_id(spark, dataset)
    r = _run([os.path.join(EX, "way_wkt.py"), dataset, str(wid)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LINESTRING (" in r.stdout


def test_example_bbox_wkt(spark, dataset):
    r = _run([os.path.join(EX, "bbox_wkt.py"), dataset, "40.5,-74.3,41.0,-73.7"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LINESTRING (" in r.stdout


def test_example_augmented_diff(spark, dataset, tmp_path):
    osc = str(tmp_path / "c.osc")
    with open(osc, "w") as f:
        f.write('<osmChange version="0.6"><delete><node id="1"/></delete>'
                "</osmChange>")
    r = _run([os.path.join(EX, "augmented_diff.py"), dataset, osc])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "delete" in r.stdout


def test_example_curation_pipeline(tmp_path):
    out = str(tmp_path / "shards")
    r = _run([os.path.join(EX, "curation_pipeline.py"), SF, out], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]


def test_example_ann_search():
    r = _run([os.path.join(EX, "ann_search.py"), SF], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "recall@5" in r.stdout


def test_example_event_analytics():
    r = _run([os.path.join(EX, "event_analytics.py"), SF], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "funnel:" in r.stdout


def test_example_corpus_profile():
    r = _run([os.path.join(EX, "corpus_profile.py"), SF], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PROFILE OK" in r.stdout
    assert "chars/token" in r.stdout


def test_example_publish_corpus(tmp_path):
    r = _run(
        [os.path.join(EX, "publish_corpus.py"), SF, str(tmp_path / "pub")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verify v1: 0 mismatched shards" in r.stdout
    assert "shard" in r.stdout and "changed" in r.stdout
    assert "PUBLISH OK" in r.stdout


def test_curate_corpus_example():
    r = _run([os.path.join(EX, "curate_corpus.py"), SF])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CURATED" in r.stdout
    assert "per-domain selection" in r.stdout


def test_example_multimodal_dedup(tmp_path):
    store = str(tmp_path / "band_store")
    r = _run([os.path.join(EX, "multimodal_dedup.py"), SF, store],
             timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "format census" in r.stdout
    assert "hits (re-ingested items match themselves at 0)" in r.stdout


def test_example_retrieve_and_mask(tmp_path):
    r = _run(
        [os.path.join(EX, "retrieve_and_mask.py"), SF,
         str(tmp_path / "bm25_index")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "from the persisted index" in r.stdout
    assert "dedup masks:" in r.stdout
    assert "distinct 3-gram estimate per source" in r.stdout
    assert "bitext mining:" in r.stdout


def test_example_codec_triage():
    r = _run([os.path.join(EX, "codec_triage.py"), SF], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "triage: container censuses" in r.stdout
    assert "TRIAGE COMPLETE" in r.stdout
    assert "damaged (per-row, no stage failure)" in r.stdout
