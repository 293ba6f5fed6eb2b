"""Weixin end-to-end import job (the reference's entry point C).

Composes the engine's primitives into the WX pipeline:

  work-table scan (WXMetaDataGenerator.generate,
      …/crawler/social/worker/WXMetaDataGenerator.java:59-119)
  → J1 anti-join vs the article table + J2 biz-expiry check
      (WXEntityImporter.doImport, …/social/worker/WXEntityImporter.java:93-146)
  → C18 template fill → fused fetch/extract (doReatableParse selectors,
      WXEntityImporter.java:345-401)
  → art / biz wide rows → merge_latest sink (put-overwrite,
      WXEntityImporter.java:155-185, prepareArtData:609-622, prepareBizData:591-602)

Reference quirks replicated on purpose (observable semantics):
  * the expiry test is INVERTED (WXEntityImporter.java:130-139): a biz row
    that exists and is NOT yet expired is re-crawled, while an expired row
    is skipped — `needCrawlerBiz = true` fires on `!isRowExpired(...)`;
  * dedup happens on the RAW work rows (GROUP BY biz,mid,idx,sn) and the
    %3D URL-decode runs AFTER it (WXMetaDataGenerator.java:95-99), so an
    encoded and a decoded form of the same biz both survive the scan —
    the merge_latest sink collapses them at write time.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmp_crawler_spark.functions import strings as S
from dmp_crawler_spark.sinks.tables import merge_latest

# sanitized analog of ARITICLE_URL_TEMPLATE (WXEntityImporter.java:56) —
# the session-key blob is dropped, the (biz, mid, idx, sn) shape is kept
ARTICLE_URL_TEMPLATE = "https://mp.example.com/s?__biz=%s&mid=%s&idx=%s&sn=%s"

EXPIRE_MONTHS = 3  # DEFAULT_EXPIRE_MONTH (WXEntityImporter.java:78)

_EXTRACT_SCHEMA = T.StructType([
    T.StructField("biz", T.StringType()),
    T.StructField("mid", T.StringType()),
    T.StructField("idx", T.StringType()),
    T.StructField("sn", T.StringType()),
    T.StructField("need_art", T.BooleanType()),
    T.StructField("need_biz", T.BooleanType()),
    T.StructField("article_title", T.StringType()),
    T.StructField("article_date", T.StringType()),
    T.StructField("article_content", T.StringType()),
    T.StructField("weixin_name", T.StringType()),
    T.StructField("weixin_code", T.StringType()),
    T.StructField("weixin_desc", T.StringType()),
])


def work_query(weixin: DataFrame, date_prefix: str, partition_source: str) -> DataFrame:
    """The Hive work-table scan (WXMetaDataGenerator.java:74): non-empty
    key filter, data_time LIKE 'date%', partition filter, GROUP BY dedup,
    then the %3D URL-decode (C17) on biz."""
    w = (
        weixin.filter(
            (F.col("biz") != "") & (F.col("mid") != "")
            & (F.col("idx") != "") & (F.col("sn") != "")
            & F.col("data_time").startswith(date_prefix)
            & (F.col("partition_source") == partition_source)
        )
        .groupBy("biz", "mid", "idx", "sn")
        .agg(F.count(F.lit(1)).alias("__n"))
        .drop("__n")
    )
    return w.withColumn(
        "biz",
        F.when(
            F.upper("biz").contains("%3D"), S.url_decode(F.col("biz"))
        ).otherwise(F.col("biz")),
    )


def plan_crawl(work: DataFrame, art_table: DataFrame | None,
               biz_table: DataFrame | None, now_ts) -> DataFrame:
    """Attach need_art / need_biz flags + the target URL; keep only rows
    needing a fetch (WXEntityImporter.java:107-148).

    art_table: (rowkey) of existing article rows. biz_table: (rowkey,
    updated_ts) of existing biz rows. now_ts: an aware datetime or
    timestamp literal — passed in, never wall-clock, so plans replay."""
    w = work.withColumn(
        "rowkey", F.concat_ws("_", "biz", "mid", "idx", "sn")
    )
    if art_table is not None and not _is_empty(art_table):
        seen_art = art_table.select(F.col("rowkey").alias("__art_rk")).distinct()
        w = w.join(
            F.broadcast(seen_art), w.rowkey == F.col("__art_rk"), "left"
        ).withColumn("need_art", F.col("__art_rk").isNull()).drop("__art_rk")
    else:
        w = w.withColumn("need_art", F.lit(True))
    if biz_table is not None and not _is_empty(biz_table):
        biz_seen = biz_table.select(
            F.col("rowkey").alias("__biz_rk"), F.col("updated_ts").alias("__biz_ts")
        )
        w = w.join(F.broadcast(biz_seen), w.biz == F.col("__biz_rk"), "left")
        expired = F.months_between(F.lit(now_ts), F.col("__biz_ts")) >= EXPIRE_MONTHS
        # reference quirk (WXEntityImporter.java:130-139): existing AND
        # NOT-expired → re-crawl; existing AND expired → skip
        w = w.withColumn(
            "need_biz",
            F.col("__biz_rk").isNull() | ~expired,
        ).drop("__biz_rk", "__biz_ts")
    else:
        w = w.withColumn("need_biz", F.lit(True))
    w = w.filter(F.col("need_art") | F.col("need_biz"))
    return w.withColumn(
        "url", F.format_string(ARTICLE_URL_TEMPLATE, "biz", "mid", "idx", "sn")
    )


def _is_empty(df: DataFrame) -> bool:
    return df.isEmpty()


def extract_articles(pages: DataFrame) -> DataFrame:
    """Arrow-batched parse of fetched article pages with the reference's
    selectors (doReatableParse, WXEntityImporter.java:368-378):
    #activity-name, #post-date, #js_content, #js_profile_qrcode
    strong.profile_nickname, span.profile_meta_value (first = code,
    second = description)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from dmp_crawler_spark.extractors.htmlmini import parse

        for pdf in batches:
            rows = {f.name: [] for f in _EXTRACT_SCHEMA.fields}
            for rec in pdf.to_dict("records"):
                root = parse(rec["html"] or "")

                def sel(selector: str) -> str:
                    el = root.select_one(selector)
                    return el.text() if el is not None else ""

                profiles = root.select("#js_profile_qrcode span.profile_meta_value")
                rows["biz"].append(rec["biz"])
                rows["mid"].append(rec["mid"])
                rows["idx"].append(rec["idx"])
                rows["sn"].append(rec["sn"])
                rows["need_art"].append(rec["need_art"])
                rows["need_biz"].append(rec["need_biz"])
                rows["article_title"].append(sel("#activity-name"))
                rows["article_date"].append(sel("#post-date"))
                rows["article_content"].append(sel("#js_content"))
                rows["weixin_name"].append(
                    sel("#js_profile_qrcode strong.profile_nickname")
                )
                rows["weixin_code"].append(profiles[0].text() if profiles else "")
                rows["weixin_desc"].append(
                    profiles[1].text() if len(profiles) > 1 else ""
                )
            yield pd.DataFrame(rows, columns=list(rows))

    cols = pages.select("biz", "mid", "idx", "sn", "need_art", "need_biz", "html")
    return cols.mapInPandas(run, _EXTRACT_SCHEMA)


def art_rows(extracted: DataFrame, crawl_iter: int = 0) -> DataFrame:
    """prepareArtData (WXEntityImporter.java:609-622): wide rows for the
    article table, gated on weixin_code != '' and need_art."""
    e = extracted.filter((F.col("weixin_code") != "") & F.col("need_art"))
    return e.select(
        F.concat_ws("_", "biz", "mid", "idx", "sn").alias("rowkey"),
        F.lit("info").alias("family"),
        F.create_map(
            F.lit("article_title"), "article_title",
            F.lit("article_date"), "article_date",
            F.lit("article_content"), "article_content",
            F.lit("account_code"), "weixin_code",
            F.lit("account_name"), "weixin_name",
            F.lit("account_desc"), "weixin_desc",
        ).alias("cols"),
        F.lit(crawl_iter).alias("crawl_iter"),
    )


def biz_rows(extracted: DataFrame, crawl_iter: int = 0) -> DataFrame:
    """prepareBizData (WXEntityImporter.java:591-602): wide rows for the
    biz table keyed by biz alone, gated on weixin_code != '' and need_biz."""
    e = extracted.filter((F.col("weixin_code") != "") & F.col("need_biz"))
    return e.select(
        F.col("biz").alias("rowkey"),
        F.lit("info").alias("family"),
        F.create_map(
            F.lit("biz"), "biz",
            F.lit("nickname"), "weixin_name",
            F.lit("profile"), "weixin_desc",
            F.lit("value"), "weixin_code",
        ).alias("cols"),
        F.lit(crawl_iter).alias("crawl_iter"),
    )


def run_import(
    spark: SparkSession,
    weixin: DataFrame,
    fetcher,
    date_prefix: str,
    partition_source: str,
    now_ts,
    art_table: DataFrame | None = None,
    biz_table: DataFrame | None = None,
    crawl_iter: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline run → (art_merged, biz_merged) wide tables.

    fetcher: callable (DataFrame with url column) -> DataFrame with
    (url, html) — the test uses a corpus-backed join fetch, a deployment
    plugs a real fetch stage here."""
    work = work_query(weixin, date_prefix, partition_source)
    plan = plan_crawl(work, art_table, biz_table, now_ts)
    pages = fetcher(plan)
    extracted = extract_articles(pages)
    art = merge_latest(art_rows(extracted, crawl_iter))
    biz = merge_latest(biz_rows(extracted, crawl_iter))
    return art, biz
