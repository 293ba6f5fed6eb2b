"""Distributed materialization of the synthetic web corpus.

Generates the `pages` table exactly per BASELINE.json input_hint —
(url string, warc_ts timestamp, html binary, text string, lang string) —
plus the seeds / robots / site_rules config tables (FIXTURES.md §2-4).

Generation is `spark.range(n) → mapInPandas`, so it scales horizontally:
each partition builds its rows from the deterministic templates with no
driver involvement and no shared state — the same pattern generates 10^10
rows on a cluster as 10^4 locally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmp_crawler_spark.corpus import templates

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])


def _gen_batches(n_urls: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [templates.build_page(int(i), n_urls) for i in pdf["id"].values]
            yield pd.DataFrame({
                "url": [r["url"] for r in rows],
                "warc_ts": [r["warc_ts"] for r in rows],
                "html": [r["html"] for r in rows],
                "text": [r["text"] for r in rows],
                "lang": [r["lang"] for r in rows],
            })
    return gen


def generate_pages(spark: SparkSession, n_urls: int, partitions: int | None = None) -> DataFrame:
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_urls, numPartitions=partitions)
    return base.mapInPandas(_gen_batches(n_urls), PAGES_SCHEMA)


def write_pages(spark: SparkSession, n_urls: int, path: str, partitions: int | None = None) -> None:
    generate_pages(spark, n_urls, partitions).write.mode("overwrite").parquet(path)


def generate_seeds(spark: SparkSession, n_urls: int, n_seeds: int = 32) -> DataFrame:
    """Seed list incl. range templates (SeedParser, common/SeedParser.java:5-31)."""
    rows = []
    for i in range(n_seeds):
        idx = (i * 9973) % n_urls
        rows.append((templates.url_for(idx, n_urls), templates.archetype_for(idx)))
    # two range-template seeds exercising S1 seed expansion
    h = templates.host_for(1, n_urls)
    rows.append((f"http://{h}/bbs_post/[1-5].html", "bbs_post"))
    rows.append((f"http://{h}/article/[10-14].html", "article"))
    return spark.createDataFrame(rows, "seed string, site string")


def generate_robots(spark: SparkSession, n_urls: int) -> DataFrame:
    """Per-host robots rules: every 7th host disallows /private/; deterministic
    crawl delays mirroring the reference sleeps (…/crawler/ms/Crawler4Dxy_BBS.java:170)."""
    nh = templates.n_hosts_for(n_urls)
    rows = []
    for h in range(nh):
        host = f"h{h}.example.com"
        if h % 7 == 0:
            rows.append((host, "*", "disallow", "/private/", 0))
        delay = [0, 2000, 3000][h % 3]
        rows.append((host, "*", "allow", "/", delay))
    return spark.createDataFrame(
        rows, "host string, user_agent string, rule string, path_prefix string, crawl_delay_ms int"
    )


def generate_site_rules(spark: SparkSession) -> DataFrame:
    """The per-site dispatch/score registry (config-as-data) — the Spark form
    of the shouldVisit regexes (…/crawler/auto/Crawler4Autohome.java:53-77)."""
    rows = [
        (arch, arch, rf"https?://[^/]+/{arch}/\d+\.html", 1.0 + i * 0.1, f"extract_{arch}")
        for i, arch in enumerate(templates.ARCHETYPES)
    ]
    return spark.createDataFrame(
        rows, "site string, page_class string, url_regex string, score double, extractor string"
    )


def generate_dictionaries(spark: SparkSession, n: int = 1000) -> DataFrame:
    """key→name dictionary mirroring name.properties lookups
    (…/common/ConfigUtil.java:12-31)."""
    return spark.range(n).select(
        F.format_string("key%04d", F.col("id")).alias("key"),
        F.format_string("名称%04d", F.col("id")).alias("name"),
    )
