"""read_documents must normalize every supported container to the
canonical documents schema, deriving what the input lacks."""

from __future__ import annotations

import pytest

import gzip
import json

from osmexpress_spark.sources.corpus import DOCUMENTS_SCHEMA, read_documents


@pytest.mark.slow
def test_jsonl_gz_normalizes_and_derives(spark, tmp_path):
    p = tmp_path / "drop.jsonl.gz"
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "extra": "x"},
        {"doc_id": 2, "text": "bonjour", "lang": "fr"},
    ]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_documents(spark, str(p))
    assert df.schema == DOCUMENTS_SCHEMA
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].n_chars == len("hello world")   # derived
    assert got[1].source is None                  # defaulted
    assert got[2].lang == "fr"
    assert "extra" not in df.columns              # dropped


@pytest.mark.slow
def test_csv_and_parquet_roundtrip(spark, tmp_path):
    csv = tmp_path / "corpus.csv"
    csv.write_text("doc_id,text,source\n7,seven words here,web\n")
    df = read_documents(spark, str(csv))
    assert df.schema == DOCUMENTS_SCHEMA
    r = df.collect()[0]
    assert (r.doc_id, r.source, r.lang) == (7, "web", None)

    df2 = read_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df2.schema == DOCUMENTS_SCHEMA
    assert df2.count() == 500


def test_missing_required_column_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "body": "no text column"}\n')
    import pytest
    with pytest.raises(ValueError, match="text"):
        read_documents(spark, str(p))


@pytest.mark.slow
def test_write_documents_jsonl_roundtrip(spark, tmp_path):
    from osmexpress_spark.sources import corpus

    df = spark.createDataFrame(
        [(1, "hello world", "en", "s0", 11), (2, "bonjour", "fr", "s1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "export")
    corpus.write_documents(df, out, fmt="jsonl", partitions=2)
    back = corpus.read_documents(spark, out + "/*.json.gz", fmt="json")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    import glob
    files = glob.glob(out + "/part-*.json.gz")
    assert len(files) == 2  # many member files, no coalesce(1)
    import pytest
    with pytest.raises(ValueError):
        corpus.write_documents(df, out, fmt="xml")
