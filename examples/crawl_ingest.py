"""End-to-end crawl ingestion: WARC files -> curated documents.

    python examples/crawl_ingest.py WARC_DIR [ROBOTS.parquet] OUT_DIR

The round-10 surface composed the way a Common Crawl pipeline runs it,
each stage the operator behind its own gate/tests:

1. `read_warc` + `warc_bodies` — .warc(.gz) FILES, one task per
   archive, record bodies out of the zero-shuffle seam
   (sources/warc.py; gate q_warc_census)
2. `decode_text`      — response bytes -> text via the charset sniff
                        ladder (multimodal; gate q_charset_decode)
3. `html_strip`       — tag soup -> visible text, scan-side
                        (text.py; gate q_html_strip)
4. URL canonicalize   — normalized URL + registrable domain, the
                        dedup/quota keys (text.py; gate q_url_parse)
5. `robots_admit`     — longest-prefix admission against per-domain
                        robots.txt rules (operators/crawl.py)
6. `lang_id` + `gopher_flags` — scan-side language/quality columns
7. URL-exact dedup    — one survivor per normalized URL

Output: documents-shaped parquet (doc_id, text, lang, source, n_chars)
plus the domain audit column, written WITHOUT coalesce — splittability
by file count, as everywhere in this repo.

Shuffle budget of the whole pipeline: ONE broadcast join (robots
rules, dimension-sized), ONE hash aggregate on url_id (the admission
winner fold inside robots_admit — since round 11 that operator costs
exactly one Exchange, no join-back), and ONE window shuffle on
url_norm (the dedup key).  Blob/body bytes never shuffle; every other
stage is scan-side or an Arrow seam over the record rows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from osmexpress_spark import get_spark
from osmexpress_spark.operators import crawl as crawl_mod
from osmexpress_spark.operators import multimodal, text
from osmexpress_spark.sources import warc as warc_mod


def ingest(spark, warc_dir: str, robots_parquet: str | None = None):
    """The composed pipeline as a DataFrame (no action run)."""
    raw = warc_mod.read_warc(spark, warc_dir, records=False)
    recs = warc_mod.warc_bodies(raw.select("item_id", "payload"))
    responses = recs.where(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    decoded = multimodal.decode_text(
        responses.select("item_id", "rec_idx", "target_uri", "body"),
        payload_col="body",
        out_col="raw_text",
    ).drop("body")
    url = F.col("target_uri")
    out = (
        decoded.where(F.col("raw_text").isNotNull())
        .select(
            "item_id", "rec_idx", "target_uri",
            text.url_normalize(url).alias("url_norm"),
            # PSL-correct site grouping (round 11): foo.co.uk and
            # bar.co.uk are distinct sites; the embedded PSL_SUBSET is
            # the default rule table, production injects the full list
            text.registrable_domain_psl(url).alias("domain"),
            text.url_path(url).alias("path"),
            text.html_strip(F.col("raw_text")).alias("text"),
        )
        .withColumn("lang", text.lang_id(F.col("text")))
        .withColumn("url_id", F.xxhash64("url_norm"))
    )
    if robots_parquet:
        rules = crawl_mod.robots_rules(spark.read.parquet(robots_parquet))
        out = crawl_mod.robots_admit(
            out, rules, url_id_col="url_id",
            domain_col="domain", path_col="path",
        ).where(F.col("admitted"))
    # URL-exact dedup: deterministic survivor per normalized URL
    win = Window.partitionBy("url_norm").orderBy("item_id", "rec_idx")
    out = (
        out.withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    return out.select(
        F.col("url_id").alias("doc_id"),
        "text",
        "lang",
        F.col("url_norm").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
        "domain",
    )


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    warc_dir, out_dir = sys.argv[1], sys.argv[-1]
    robots = sys.argv[2] if len(sys.argv) > 3 else None
    spark = get_spark(app_name="crawl-ingest")
    df = ingest(spark, warc_dir, robots)
    df.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(f"ingested {n} documents -> {out_dir}")


if __name__ == "__main__":
    main()
