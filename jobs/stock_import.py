"""10jqka stock base-info import job (the reference's entry point family:
4-market union → pagination API loop → per-stock detail enrich → batched
HBase put).

Mirrors Crawler410jqka.doCrawl (…/crawler/stock/Crawler410jqka.java:73-150)
+ fetchStockPlate (:190-221), composed from the already-tested operator
pieces as one declarative plan — no Python in the pipeline:

  market union   4 static homepage URLs (S7; HOMEPAGE_URL_ARRAY :61)
  stock_type     regexpExtract(url, '/stock/fl/([a-zA-Z]+)/') (:78)
  totalPage      span.page_info html '1/N' → '[0-9]+/([0-9]+)' (:82-84)
  W3 unroll      explode(sequence(1, totalPage)) — the for-i loop (:89)
  C18 URL        '…/stockcode/asc/<i>/<type>/quote' (:97)
  parse          result.data[] → (stockcode, stockid, stockname) (:108-115)
  J4 enrich      per-stock detail page → 'dl.company_details > dd' text
                 + '板块', dd[1] title attr; joined ',' (:198-220)
  sink           rowkey '00150107_'+stockcode, family 'stock_info',
                 cols {stockid, stockname, stockplate} (:120-122)

At scale the API fetch is a bounded per-page fan-out (pages × markets
tasks) and the detail enrich is a distinct-key join (one fetch per stock,
N quote rows sharing a code cost one fetch) — the same shape as the
engine's EnrichmentSpec stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROWKEY_PREFIX = "00150107_"
FAMILY = "stock_info"
HOMEPAGE_TEMPLATE = "http://q.10jqka.com.cn/stock/fl/%s/#refCountId=qs_fl"
API_TEMPLATE = "http://q.10jqka.com.cn/interface/stock/fl/stockcode/asc/%s/%s/quote"
DETAIL_TEMPLATE = "http://stockpage.10jqka.com.cn/%s"

MARKETS = ["sza", "szb", "sha", "shb"]  # HOMEPAGE_URL_ARRAY order

_DATA_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("stockcode", T.StringType()),
    T.StructField("stockid", T.StringType()),
    T.StructField("stockname", T.StringType()),
]))


def market_table(spark: SparkSession) -> DataFrame:
    """The 4 static market homepages (S7 in-code table)."""
    return spark.createDataFrame(
        [(i, m, HOMEPAGE_TEMPLATE % m) for i, m in enumerate(MARKETS)],
        "market_idx int, stock_type string, homepage_url string",
    )


def plan_pages(markets: DataFrame, home_fetcher) -> DataFrame:
    """Homepage fetch → totalPage parse → W3 page unroll → API URLs.
    home_fetcher: DataFrame[..., homepage_url] -> + page_info (the
    span.page_info inner html, e.g. '1/42')."""
    m = markets.withColumn(
        "stock_type_parsed",
        F.regexp_extract("homepage_url", r"/stock/fl/([a-zA-Z]+)/", 1),
    )
    fetched = home_fetcher(m)
    total = F.regexp_extract("page_info", r"[0-9]+/([0-9]+)", 1).cast("int")
    return (
        fetched.withColumn("total_page", total)
        .filter(F.col("total_page") >= 1)
        .withColumn("page", F.explode(F.sequence(F.lit(1), F.col("total_page"))))
        .withColumn(
            "url",
            F.format_string(API_TEMPLATE, F.col("page"), F.col("stock_type_parsed")),
        )
    )


def parse_quotes(api_fetched: DataFrame, payload_col: str = "payload") -> DataFrame:
    """result.data[] → one row per stock (stockcode, stockid, stockname)."""
    data = F.from_json(
        F.get_json_object(F.col(payload_col), "$.data"), _DATA_SCHEMA
    )
    return (
        api_fetched.select(F.explode(data).alias("s"))
        .select("s.stockcode", "s.stockid", "s.stockname")
        .filter(F.col("stockcode").isNotNull() & (F.col("stockcode") != ""))
    )


def enrich_plates(quotes: DataFrame, detail_fetcher) -> DataFrame:
    """fetchStockPlate as a distinct-key enrichment join: territory =
    first dd text + '板块', concept = dd[1] title attr when present,
    joined ','. A failed detail fetch (NULL payload after the reference's
    3 retries) yields stockplate '' (:160-178)."""
    ids = quotes.select("stockcode").distinct().withColumn(
        "url", F.format_string(DETAIL_TEMPLATE, "stockcode")
    )
    detail = detail_fetcher(ids)
    territory = F.regexp_extract(
        F.coalesce(F.col("payload"), F.lit("")), r"<dd>([^<]*)</dd>", 1
    )
    concept = F.regexp_extract(
        F.coalesce(F.col("payload"), F.lit("")), r'<dd title="([^"]*)"', 1
    )
    plate = F.concat_ws(
        ",",
        F.when(territory != "", F.concat(territory, F.lit("板块"))),
        F.when(concept != "", concept),
    )
    plates = detail.select("stockcode", plate.alias("stockplate"))
    return quotes.join(plates, "stockcode", "left").withColumn(
        "stockplate", F.coalesce("stockplate", F.lit(""))
    )


def assemble(rows: DataFrame) -> DataFrame:
    """Wide-row sink shape (prepareData :120-122)."""
    return rows.select(
        F.concat(F.lit(ROWKEY_PREFIX), "stockcode").alias("rowkey"),
        F.lit(FAMILY).alias("family"),
        F.create_map(
            F.lit("stockid"), F.col("stockid"),
            F.lit("stockname"), F.col("stockname"),
            F.lit("stockplate"), F.col("stockplate"),
        ).alias("cols"),
    )


def run_import(spark: SparkSession, home_fetcher, api_fetcher,
               detail_fetcher) -> DataFrame:
    """markets → page plan → API fetch → quote parse → plate enrich → sink.
    Fetchers are callables DataFrame[..., url] -> + payload (the AjaxClient
    analog; tests/oracles use deterministic Column-expression payloads)."""
    pages = plan_pages(market_table(spark), home_fetcher)
    quotes = parse_quotes(api_fetcher(pages))
    return assemble(enrich_plates(quotes, detail_fetcher))
