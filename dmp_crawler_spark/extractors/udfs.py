"""Vectorized extraction stage: Arrow-batched mapInPandas over the html column.

This is the Spark rewrite of the reference's per-site `visit()` dispatch
(e.g. …/crawler/auto/Crawler4Autohome.java:125-141): classification by URL
regex happens JVM-side; the HTML field extraction — inherently a parse, the
one thing Catalyst can't express — runs in Arrow batches through the shared
oracle functions (extractors/oracle.py), so the pandas-UDF output is
byte-identical to the oracle by construction.

Output model mirrors the reference's 3-level HBase map
(…/crawler/BaseCrawler.java:28-55): (rowkey, family, cols map<string,string>).

Link discovery (HtmlParseData.getOutgoingUrls + addSeed, e.g.
…/crawler/auto/Crawler4BitAuto.java:357,564) becomes a UDTF-style
mapInPandas producing (src_url, out_url, anchor) rows — data, not control
flow — implemented with pandas' vectorized str.extractall (no per-row loop).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmp_crawler_spark.extractors import oracle

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("rowkey", T.StringType(), True),
    T.StructField("family", T.StringType(), True),
    T.StructField("cols", T.MapType(T.StringType(), T.StringType()), True),
])

LINKS_SCHEMA = T.StructType([
    T.StructField("src_url", T.StringType(), False),
    T.StructField("out_url", T.StringType(), False),
    T.StructField("anchor", T.StringType(), True),
])

_HREF_RE = r'<a\s[^>]*href="([^"#]+)"[^>]*>(.*?)</a>'


def _decode(html) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        # GBK fallback mirrors common/AjaxClient.java:110,127 decode path
        try:
            return bytes(html).decode("utf-8")
        except UnicodeDecodeError:
            return bytes(html).decode("gbk", errors="replace")
    return str(html)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"url": [], "rowkey": [], "family": [], "cols": []}
        for url, html in zip(pdf["url"].values, pdf["html"].values):
            for row in oracle.extract(url, _decode(html)):
                out["url"].append(url)
                out["rowkey"].append(row["rowkey"])
                out["family"].append(row["family"])
                out["cols"].append(row["cols"])
        yield pd.DataFrame(out, columns=["url", "rowkey", "family", "cols"])


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) -> (url, rowkey, family, cols).

    Column-prunes to (url, html) before the Python stage so the Arrow
    transfer carries only what the parse needs.
    """
    return pages.select("url", "html").mapInPandas(_extract_batches, EXTRACT_SCHEMA)


def _links_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        html = pdf["html"].map(_decode)
        hits = html.str.extractall(_HREF_RE)  # vectorized, not per-row Python
        if hits.empty:
            yield pd.DataFrame({"src_url": [], "out_url": [], "anchor": []}).astype(str)
            continue
        src = pdf["url"].iloc[hits.index.get_level_values(0)].reset_index(drop=True)
        yield pd.DataFrame({
            "src_url": src,
            "out_url": hits[0].reset_index(drop=True),
            "anchor": hits[1].reset_index(drop=True),
        })


def discover_links(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) -> exploded (src_url, out_url, anchor) rows."""
    return pages.select("url", "html").mapInPandas(_links_batches, LINKS_SCHEMA)


COMBINED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),  # 'result' | 'link'
    T.StructField("rowkey", T.StringType(), True),
    T.StructField("family", T.StringType(), True),
    T.StructField("cols", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("out_url", T.StringType(), True),
    T.StructField("anchor", T.StringType(), True),
])


def _combined_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {k: [] for k in
                                 ("url", "kind", "rowkey", "family", "cols",
                                  "out_url", "anchor")}
        html = pdf["html"].map(_decode)
        # links: vectorized extractall over the whole batch
        hits = html.str.extractall(_HREF_RE)
        if not hits.empty:
            src = pdf["url"].iloc[hits.index.get_level_values(0)].values
            for s, o, a in zip(src, hits[0].values, hits[1].values):
                rows["url"].append(s)
                rows["kind"].append("link")
                rows["rowkey"].append(None)
                rows["family"].append(None)
                rows["cols"].append(None)
                rows["out_url"].append(o)
                rows["anchor"].append(a)
        # results: one oracle parse per page (the single parse pass)
        for url, h in zip(pdf["url"].values, html.values):
            for row in oracle.extract(url, h):
                rows["url"].append(url)
                rows["kind"].append("result")
                rows["rowkey"].append(row["rowkey"])
                rows["family"].append(row["family"])
                rows["cols"].append(row["cols"])
                rows["out_url"].append(None)
                rows["anchor"].append(None)
        yield pd.DataFrame(rows, columns=list(rows))


def extract_and_links(pages: DataFrame) -> DataFrame:
    """One Python pass producing BOTH extraction rows and link rows
    (kind='result'|'link'). The crawl loop caches this, so html crosses
    the Arrow boundary once per iteration instead of twice."""
    return pages.select("url", "html").mapInPandas(_combined_batches, COMBINED_SCHEMA)


def classify_pages(pages: DataFrame) -> DataFrame:
    """F2 URL-class dispatch, JVM-side (regex gate before the Python stage),
    mirroring shouldVisit (…/crawler/auto/Crawler4Autohome.java:97-141)."""
    return pages.withColumn(
        "page_class", F.regexp_extract("url", r"https?://[^/]+/([a-z_]+)/", 1)
    )
