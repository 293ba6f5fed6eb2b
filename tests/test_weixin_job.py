"""Weixin end-to-end import job (entry point C) against a hand-computed
fixture: dedup, %3D decode, art anti-join, the INVERTED biz-expiry quirk,
the empty-weixinCode gate, and the merge sink."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dmp_crawler_spark.corpus.templates import build_weixin_page
from jobs import weixin_import as wx

NOW = datetime(2016, 9, 1, tzinfo=timezone.utc)


def _fetcher(plan):
    """Corpus-backed fetch: html from the deterministic page builder; the
    (biz='bBLOCKED') page comes back with an empty weixin code."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["html"] = [
                build_weixin_page(b, m, i, s, empty_code=(b == "bBLOCKED"))
                for b, m, i, s in zip(pdf["biz"], pdf["mid"], pdf["idx"], pdf["sn"])
            ]
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        plan.schema.fields + [T.StructField("html", T.StringType())]
    )
    return plan.mapInPandas(run, schema)


@pytest.fixture(scope="module")
def tables(spark):
    weixin = spark.createDataFrame(
        [
            # plain new row
            ("b1", "m1", "1", "s1", "20160830120000", "src"),
            # duplicate of the same keys → one fetch
            ("b1", "m1", "1", "s1", "20160830130000", "src"),
            # %3D-encoded biz → decoded to b1==x after the group-by
            ("b2%3Dx", "m2", "1", "s2", "20160830120000", "src"),
            # empty-field rows → filtered
            ("", "m3", "1", "s3", "20160830120000", "src"),
            ("b4", "", "1", "s4", "20160830120000", "src"),
            # wrong date prefix / wrong partition → filtered
            ("b5", "m5", "1", "s5", "20160730120000", "src"),
            ("b6", "m6", "1", "s6", "20160830120000", "other"),
            # art row already exists → need_art False (biz fresh → still fetched)
            ("bSEEN", "m7", "1", "s7", "20160830120000", "src"),
            # biz exists and EXPIRED → need_biz False (reference quirk);
            # art also exists → fully skipped
            ("bOLD", "m8", "1", "s8", "20160830120000", "src"),
            # blocked page → empty weixin code → nothing written
            ("bBLOCKED", "m9", "1", "s9", "20160830120000", "src"),
        ],
        "biz string, mid string, idx string, sn string, data_time string, partition_source string",
    )
    art_table = spark.createDataFrame(
        [("bSEEN_m7_1_s7",), ("bOLD_m8_1_s8",)], "rowkey string"
    )
    biz_table = spark.createDataFrame(
        [
            # fresh (< 3 months) → quirk: re-crawled
            ("bSEEN", datetime(2016, 8, 1, tzinfo=timezone.utc)),
            # expired (>= 3 months) → quirk: skipped
            ("bOLD", datetime(2016, 3, 1, tzinfo=timezone.utc)),
        ],
        "rowkey string, updated_ts timestamp",
    )
    return weixin, art_table, biz_table


def test_work_query_dedup_filter_decode(spark, tables):
    weixin, _, _ = tables
    w = wx.work_query(weixin, "201608", "src").collect()
    bizs = sorted(r["biz"] for r in w)
    # 6 surviving work rows; b2%3Dx decoded AFTER dedup → 'b2=x'
    assert bizs == ["b1", "b2=x", "bBLOCKED", "bOLD", "bSEEN"]


def test_plan_crawl_flags(spark, tables):
    weixin, art, biz = tables
    plan = wx.plan_crawl(wx.work_query(weixin, "201608", "src"), art, biz, NOW)
    rows = {r["biz"]: r for r in plan.collect()}
    # bOLD: art exists AND biz expired → dropped entirely (the quirk)
    assert "bOLD" not in rows
    # bSEEN: art exists (need_art False) but biz fresh → need_biz True
    assert rows["bSEEN"]["need_art"] is False
    assert rows["bSEEN"]["need_biz"] is True
    # new keys: both flags
    assert rows["b1"]["need_art"] and rows["b1"]["need_biz"]
    # C18 template fill
    assert rows["b1"]["url"] == "https://mp.example.com/s?__biz=b1&mid=m1&idx=1&sn=s1"


def test_run_import_end_to_end(spark, tables):
    weixin, art, biz = tables
    art_out, biz_out = wx.run_import(
        spark, weixin, _fetcher, "201608", "src", NOW,
        art_table=art, biz_table=biz,
    )
    art_rows = {r["rowkey"]: dict(r["cols"]) for r in art_out.collect()}
    biz_rows = {r["rowkey"]: dict(r["cols"]) for r in biz_out.collect()}
    # art written for the three new keys only: bSEEN (art exists),
    # bOLD (skipped), bBLOCKED (empty code) all absent
    assert sorted(art_rows) == ["b1_m1_1_s1", "b2=x_m2_1_s2"]
    # biz written for new keys AND the fresh bSEEN (inverted-expiry quirk)
    assert sorted(biz_rows) == ["b1", "b2=x", "bSEEN"]
    # extraction contract: selector fields land in the art columns
    c = art_rows["b1_m1_1_s1"]
    assert c["article_title"].startswith("文章")
    assert c["account_code"].startswith("wx_")
    assert set(c) == {
        "article_title", "article_date", "article_content",
        "account_code", "account_name", "account_desc",
    }
    assert set(biz_rows["b1"]) == {"biz", "nickname", "profile", "value"}


def test_blocked_page_writes_nothing(spark):
    weixin = spark.createDataFrame(
        [("bBLOCKED", "m9", "1", "s9", "20160830120000", "src")],
        "biz string, mid string, idx string, sn string, data_time string, partition_source string",
    )
    art_out, biz_out = wx.run_import(
        spark, weixin, _fetcher, "201608", "src", NOW,
    )
    assert art_out.count() == 0
    assert biz_out.count() == 0


def test_gpsspg_import_pipeline(spark):
    """Entry point B (Crawler4Gpsspg): non-empty work filter, length-12
    gate, C22 split in the URL, JSONP unwrap, status gate, field mapping."""
    from pyspark.sql import functions as F

    from jobs import gpsspg_import as gp

    work = spark.createDataFrame(
        [
            ("360000010771", "i1", "20160801"),   # good
            ("36000001E77",  "i2", "20160801"),   # length 11 → gated
            ("",             "i3", "20160801"),   # empty bsid → filtered
            ("360000010772", "",   "20160801"),   # empty imsi → filtered
            ("360000010773", "i5", ""),           # empty datetime → filtered
            ("360000010774", "i6", "20160801"),   # 404 response
            ("360000010775", "i7", "20160801"),   # garbage response
            ("360000010771", "i8", "20160801"),   # duplicate bsid → one row
        ],
        "bsid string, imsi string, datetime string",
    )
    plan = gp.plan_requests(gp.work_query(work))
    urls = {r["bsid"]: r["url"] for r in plan.collect()}
    # C22 split visible in the request URL: 3600,0001,0771
    assert urls["360000010771"] == (
        "http://api.example.com/bs?bs=460,3600,0001,0771&hex=16&type=cdma"
    )
    assert set(urls) == {"360000010771", "360000010774", "360000010775"}

    def fetcher(reqs):
        resp = {
            "360000010771": 'jQuery42({"status":200,"result":[{"id":"bsX",'
                            '"lat":"31.5","lng":"121.2","radius":"80",'
                            '"address":"地址1","roads":"路1","rid":"r1",'
                            '"rids":"r1,r2"}]})',
            "360000010774": 'jQuery42({"status":404})',
            "360000010775": "banned",
        }
        mapping = F.create_map(
            *[x for k, v in resp.items() for x in (F.lit(k), F.lit(v))]
        )
        return reqs.withColumn("payload", F.element_at(mapping, F.col("bsid")))

    rows = gp.run_import(work, fetcher).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rowkey"] == "360000010771" and r["family"] == "info"
    assert dict(r["cols"]) == {
        "id": "bsX", "lat": "31.5", "lng": "121.2", "radius": "80",
        "address": "地址1", "roads": "路1", "rid": "r1", "rids": "r1,r2",
    }
