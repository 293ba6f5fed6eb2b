"""J4 as a crawl stage: per-entity secondary API fetch merged into the
extraction rows (Crawler4Jingdong.java:304-331,409-515 shape) — engine
test over a two-stage corpus fixture (pages + a price-API payload table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmp_crawler_spark.corpus import generator, templates
from dmp_crawler_spark.frontier.scheduler import (
    CorpusFetcher,
    CrawlEngine,
    EnrichmentSpec,
)
from dmp_crawler_spark.functions import strings as S

N = 300
API_TEMPLATE = "http://api.example.com/prices/get?skuid=J_%s"


def _expected_price(code: int) -> str:
    return f"{(code % 900) + 99}.{code % 100:02d}"


def _api_payload(code: int) -> str | None:
    """JSONP payloads mirroring the reference's price API: 'p' field
    normally, 'm'-only fallback every 5th, no response every 7th."""
    if code % 7 == 0:
        return None
    if code % 5 == 0:
        return f'jQuery99([{{"m":"{_expected_price(code)}"}}]);'
    return f'jQuery99([{{"p":"{_expected_price(code)}"}}]);'


@pytest.fixture(scope="module")
def api_table(spark):
    rows = [
        (API_TEMPLATE % code, _api_payload(code))
        for code in range(400000, 400000 + N)
        if _api_payload(code) is not None
    ]
    return spark.createDataFrame(rows, "url string, payload string").cache()


COMMENT_TEMPLATE = "http://club.example.com/comments?referenceIds=%s"


def _comment_payload(code: int) -> str:
    return (
        f'jQuery7({{"CommentsCount":[{{"GoodCount":{code % 5000},'
        f'"PoorCount":{code % 97}}}]}});'
    )


def _specs(spark, api_table):
    """BOTH Jingdong secondary APIs (price + comment counts,
    Crawler4Jingdong.java:304-334) as two chained enrichment stages."""

    def price_fetcher(reqs):
        return reqs.join(api_table, "url", "left").select("ent_id", "payload")

    def comment_fetcher(reqs):
        n = F.col("ent_id").cast("int")
        payload = F.concat(
            F.lit('jQuery7({"CommentsCount":[{"GoodCount":'),
            (n % 5000).cast("string"),
            F.lit(',"PoorCount":'), (n % 97).cast("string"),
            F.lit("}]});"),
        )
        return reqs.select("ent_id", payload.alias("payload"))

    unwrapped = lambda p: S.jsonp_unwrap(p)  # noqa: E731
    price = EnrichmentSpec(
        family="product_info",
        id_key="product_code",
        url_template=API_TEMPLATE,
        fetcher=price_fetcher,
        parse={
            # price: 'p' field, 'm' fallback, '' when the API had nothing —
            # parseProductPriceParam (Crawler4Jingdong.java:446-470)
            "product_price": lambda p: F.coalesce(
                F.get_json_object(unwrapped(p), "$[0].p"),
                F.get_json_object(unwrapped(p), "$[0].m"),
                F.lit(""),
            )
        },
    )
    comments = EnrichmentSpec(
        family="product_info",
        id_key="product_code",
        url_template=COMMENT_TEMPLATE,
        fetcher=comment_fetcher,
        parse={
            "good_count": lambda p: F.get_json_object(
                unwrapped(p), "$.CommentsCount[0].GoodCount"),
            "poor_count": lambda p: F.get_json_object(
                unwrapped(p), "$.CommentsCount[0].PoorCount"),
        },
    )
    return [price, comments]


def _run_engine(spark, tmp_path, api_table, fetcher):
    eng = CrawlEngine(
        spark, str(tmp_path), fetcher, generator.generate_site_rules(spark),
        per_host_budget=6, n_bloom_shards=8,
        enrichment=_specs(spark, api_table),
    )
    seeds = spark.createDataFrame(
        [(templates.url_for(i * 31 % N, N), "") for i in range(10)],
        "seed string, site string",
    )
    eng.init_from_seeds(seeds)
    eng.run(max_iters=3)
    return eng


def _check_results(results):
    rows = results.collect()
    assert rows
    n_products = 0
    for r in rows:
        cols = dict(r["cols"])
        if r["family"] == "product_info":
            n_products += 1
            code = int(cols["product_code"])
            exp = "" if code % 7 == 0 else _expected_price(code)
            assert cols["product_price"] == exp, (code, cols)
            # second enrichment stage (comment-count API) also merged
            assert cols["good_count"] == str(code % 5000), (code, cols)
            assert cols["poor_count"] == str(code % 97), (code, cols)
        else:
            assert "product_price" not in cols
            assert "good_count" not in cols
    assert n_products >= 3


def test_enrichment_corpus_fetcher(spark, tmp_path_factory, api_table):
    corpus = str(tmp_path_factory.mktemp("enrich_corpus") / "pages")
    generator.write_pages(spark, N, corpus, partitions=4)
    eng = _run_engine(
        spark, tmp_path_factory.mktemp("enrich_state"), api_table,
        CorpusFetcher(spark, corpus),
    )
    _check_results(eng.results_df())


def test_enrichment_fused_fetcher_no_double_count(spark, tmp_path_factory, api_table):
    """Fused path: the enriched copy in results/ must REPLACE (not
    duplicate) the combined slice for the same iteration."""
    eng = _run_engine(
        spark, tmp_path_factory.mktemp("enrich_fused"), api_table,
        generator.GeneratorFetcher(spark, N),
    )
    res = eng.results_df().cache()
    _check_results(res)
    dups = (
        res.groupBy("url", "rowkey").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).count()
    )
    assert dups == 0
