"""10jqka stock import job: hand-computed fixture pins every stage of
jobs/stock_import.py (Crawler410jqka.java:73-221 semantics) — totalPage
parse + W3 unroll, quote-list JSON parse, plate enrich incl. the
无-sentinel dd, the title-attr concept dd, and the retry-exhausted ''
rule, and the wide-row sink shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs import stock_import as st


def test_plan_pages_unrolls_total_pages(spark):
    markets = spark.createDataFrame(
        [(0, "sza", st.HOMEPAGE_TEMPLATE % "sza"),
         (1, "szb", st.HOMEPAGE_TEMPLATE % "szb")],
        "market_idx int, stock_type string, homepage_url string",
    )

    def home_fetcher(m):
        # market 0: '1/3' → 3 pages; market 1: '1/1' → 1 page
        return m.withColumn(
            "page_info",
            F.when(F.col("market_idx") == 0, F.lit("1/3")).otherwise(F.lit("1/1")),
        )

    pages = st.plan_pages(markets, home_fetcher).select(
        "stock_type_parsed", "page", "url"
    ).collect()
    got = {(r["stock_type_parsed"], r["page"]) for r in pages}
    assert got == {("sza", 1), ("sza", 2), ("sza", 3), ("szb", 1)}
    by_key = {(r["stock_type_parsed"], r["page"]): r["url"] for r in pages}
    assert by_key[("sza", 2)] == st.API_TEMPLATE % (2, "sza")


def test_parse_quotes_and_plate_enrich(spark):
    api = spark.createDataFrame(
        [('{"data":[{"stockcode":"000001","stockid":"i1","stockname":"平安"},'
          '{"stockcode":"000002","stockid":"i2","stockname":"万科"},'
          '{"stockcode":"","stockid":"ix","stockname":"junk"}]}',),
         ('{"data":[]}',)],
        "payload string",
    )
    quotes = st.parse_quotes(api)
    assert {r["stockcode"] for r in quotes.collect()} == {"000001", "000002"}

    detail_payloads = {
        # territory dd + concept dd with title attr
        "000001": ('<dl class="company_details"><dd>深圳</dd>'
                   '<dd title="银行,金融">c</dd></dl>'),
        # 无-sentinel second dd: no title attr → concept ''
        "000002": '<dl class="company_details"><dd>广东</dd><dd>无</dd></dl>',
    }

    def detail_fetcher(ids):
        payload = F.when(
            F.col("stockcode") == "000001", F.lit(detail_payloads["000001"])
        ).when(
            F.col("stockcode") == "000002", F.lit(detail_payloads["000002"])
        ).otherwise(F.lit(None).cast("string"))  # retry-exhausted → NULL
        return ids.withColumn("payload", payload)

    rows = st.assemble(st.enrich_plates(quotes, detail_fetcher)).collect()
    got = {r["rowkey"]: dict(r["cols"]) for r in rows}
    assert got["00150107_000001"] == {
        "stockid": "i1", "stockname": "平安", "stockplate": "深圳板块,银行,金融",
    }
    assert got["00150107_000002"] == {
        "stockid": "i2", "stockname": "万科", "stockplate": "广东板块",
    }
    for r in rows:
        assert r["family"] == st.FAMILY


def test_failed_detail_fetch_yields_empty_plate(spark):
    quotes = spark.createDataFrame(
        [("600000", "i3", "浦发")], "stockcode string, stockid string, stockname string"
    )

    def detail_fetcher(ids):
        return ids.withColumn("payload", F.lit(None).cast("string"))

    rows = st.enrich_plates(quotes, detail_fetcher).collect()
    assert rows[0]["stockplate"] == ""
