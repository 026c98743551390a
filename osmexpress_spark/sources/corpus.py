"""Corpus ingestion: normalize common raw-text container formats to
the engine's canonical documents schema.

Real corpora arrive as JSONL drops (often gzip member files), CSV
exports, or parquet; every downstream operator here assumes
(doc_id BIGINT, text STRING, lang STRING, source STRING,
n_chars BIGINT). This reader dispatches on extension, lets Spark's
codec layer decompress .gz transparently (one input split per gzip
member — gzip is not splittable, so at 100 TB ship MANY member files,
one per upstream shard, and parallelism is the file count), and
derives what is missing: n_chars from length(text), lang/source as
NULL when the input has no such columns.

No custom DataSource needed — json/csv/parquet readers with schema
projection are the idiomatic Spark path; the value added is the
single normalization contract every operator can rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _fmt_for(path: str) -> str:
    low = path.lower()
    for comp in (".gz", ".bz2", ".zst"):
        if low.endswith(comp):
            low = low[: -len(comp)]
            break
    if low.endswith((".jsonl", ".json", ".ndjson")):
        return "json"
    if low.endswith((".csv", ".tsv")):
        return "csv"
    base = low.rsplit("/", 1)[-1]
    if base.endswith(".parquet") or "." not in base:
        return "parquet"  # parquet file, or a directory of them
    raise ValueError(
        f"unsupported corpus format for {path!r}; pass fmt= explicitly"
    )


def read_documents(
    spark: SparkSession, path: str, fmt: str | None = None
) -> DataFrame:
    """Read any supported container and project it onto
    DOCUMENTS_SCHEMA. Requires doc_id and text; lang/source default to
    NULL, n_chars is derived when absent. Extra columns are dropped —
    carry them separately and join back on doc_id if needed."""
    fmt = fmt or _fmt_for(path)
    if fmt == "json":
        raw = spark.read.json(path)
    elif fmt == "csv":
        low = path.lower()
        for comp in (".gz", ".bz2", ".zst"):
            if low.endswith(comp):
                low = low[: -len(comp)]
                break
        sep = "\t" if low.endswith(".tsv") else ","
        raw = spark.read.option("header", True).option("sep", sep).csv(path)
    elif fmt == "parquet":
        raw = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    cols = set(raw.columns)
    missing = {"doc_id", "text"} - cols
    if missing:
        raise ValueError(
            f"corpus at {path} lacks required column(s) {sorted(missing)}"
        )
    null_str = F.lit(None).cast("string")
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("string").alias("text"),
        (F.col("lang").cast("string") if "lang" in cols else null_str).alias(
            "lang"
        ),
        (
            F.col("source").cast("string") if "source" in cols else null_str
        ).alias("source"),
        (
            F.col("n_chars").cast("long")
            if "n_chars" in cols
            else F.length("text").cast("long")
        ).alias("n_chars"),
    )


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "jsonl",
    compression: str | None = "gzip",
    partitions: int | None = None,
) -> None:
    """Export a documents frame for interchange: 'jsonl' (the corpus
    lingua franca; gzip-compressed member files by default — one file
    per partition, so downstream splittability comes from file COUNT,
    the same rule the reader documents) or 'parquet'. `compression`
    applies to BOTH formats (parquet accepts snappy/zstd/gzip/none);
    None keeps each writer's own default. No coalesce(1): single-file
    exports belong to the caller's cat step, not the cluster's."""
    out = df.repartition(partitions) if partitions else df
    if fmt == "jsonl":
        w = out.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.json(path)
    elif fmt == "parquet":
        w = out.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt!r}")
