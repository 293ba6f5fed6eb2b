"""Gpsspg base-station import job (the reference's entry point B family:
IPageCrawler doCrawl work-scan → per-key API → parse → HBase).

Mirrors Crawler4Gpsspg.loadAndSave (…/crawler/gpsspg/Crawler4Gpsspg.java:
140-190) + getBSByTelecomCMDA (:196-213) + str2BsidMetaData (:381-424),
entirely as Column expressions — no Python in the pipeline:

  work scan   distinct bsid, imsi/bsid/datetime non-empty (:153)
  gate        bsid.length == 12 (:198)
  C22 split   sid/nid/bid = 4+4+4 substrings (:200-203)
  C18 URL     'mmc,sid,nid,bid' + hex param (getURL4CDMA :288-293)
  fetch       pluggable fetcher (the AjaxClient analog)
  parse       JSONP unwrap 'jQuery\\d+.*\\((\\{.*\\})+\\)' (:390),
              status==200 gate (:405), result[0]'s 8 fields (:407-415)
  sink        wide rows rowkey=bsid, family 'info' (prepareBSData :223-238)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmp_crawler_spark.functions import strings as S

DEFAULT_MMC = "460"
BS_SEPARATOR = ","
URL_TEMPLATE = "http://api.example.com/bs?bs=%s&hex=16&type=cdma"

_FIELDS = ["id", "lat", "lng", "radius", "address", "roads", "rid", "rids"]


def work_query(bsid_table: DataFrame) -> DataFrame:
    """SELECT DISTINCT bsid WHERE imsi/bsid/datetime all non-empty."""
    return (
        bsid_table.filter(
            (F.col("imsi") != "") & (F.col("bsid") != "") & (F.col("datetime") != "")
        )
        .select("bsid")
        .distinct()
    )


def plan_requests(work: DataFrame) -> DataFrame:
    """Length-12 gate, C22 split, CDMA request URL."""
    w = work.filter(F.length("bsid") == 12)
    bs_string = F.concat_ws(
        BS_SEPARATOR,
        F.lit(DEFAULT_MMC),
        S.bsid_sid("bsid"), S.bsid_nid("bsid"), S.bsid_bid("bsid"),
    )
    return w.withColumn("url", F.format_string(URL_TEMPLATE, bs_string))


def parse_responses(fetched: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JSONP unwrap + status gate + result[0] fields → wide rows."""
    js = F.regexp_extract(F.col(payload_col), r"jQuery\d+.*\((\{.*\})+\)", 1)
    ok = (js != "") & (F.get_json_object(js, "$.status") == "200")
    pairs = []
    for f in _FIELDS:
        pairs += [F.lit(f), F.get_json_object(js, f"$.result[0].{f}")]
    return (
        fetched.filter(ok)
        .select(
            F.col("bsid").alias("rowkey"),
            F.lit("info").alias("family"),
            F.create_map(*pairs).alias("cols"),
        )
    )


def run_import(bsid_table: DataFrame, fetcher) -> DataFrame:
    """work scan → request plan → fetch → parse. fetcher: callable
    DataFrame[bsid, url] -> DataFrame[bsid, url, payload]."""
    return parse_responses(fetcher(plan_requests(work_query(bsid_table))))
