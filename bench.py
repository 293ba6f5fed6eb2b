"""Benchmark harness: headline queries + crawl throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "crawl": {"urls_per_sec": ..., "iters": ..., "urls": ...}}

Queries are materialized with the noop sink (full execution, no collect).
Run `python bench.py --scaling` for the N vs 4N evidence (local[8] vs
local[32] in subprocesses; results also appended to BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "q1_pricing_summary",
    "j1_anti_join_seen",
    "j3_broadcast_lookup",
    "j4_enrichment_join",
    "w1_priority_ranking",
    "a2_collect_set_str",
    "c14_md5_dedup",
    "token_counts",
    "quality_score",
    "dedup_exact_norm",
    "lang_id",
    "ann_topk",
    "event_hourly",
    "event_gaps",
    "minhash_pairs",
    "simhash_pairs",
]

CRAWL_N_URLS = int(os.environ.get("BENCH_CRAWL_URLS", "20000"))
CRAWL_ITERS = int(os.environ.get("BENCH_CRAWL_ITERS", "3"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    # warm-up: JVM/codegen/parquet-footer costs don't belong to q1's number
    for t in ("lineitem", "orders", "documents", "embeddings", "events", "part"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def run_crawl_bench(spark, tmp_dir: str) -> dict:
    """Frontier-scheduling + extraction throughput (URLs/sec): generate a
    corpus, seed it, run CRAWL_ITERS full iterations, count pages crawled."""
    from dmp_crawler_spark.corpus import generator, templates
    from dmp_crawler_spark.frontier.scheduler import CorpusFetcher, CrawlEngine

    corpus = os.path.join(tmp_dir, "pages")
    generator.write_pages(spark, CRAWL_N_URLS, corpus)
    seeds = spark.createDataFrame(
        [(templates.url_for(i * 131 % CRAWL_N_URLS, CRAWL_N_URLS), "")
         for i in range(64)],
        "seed string, site string",
    )
    eng = CrawlEngine(
        spark, os.path.join(tmp_dir, "state"), CorpusFetcher(spark, corpus),
        generator.generate_site_rules(spark),
        per_host_budget=50, n_bloom_shards=16,
    )
    t0 = time.monotonic()
    eng.init_from_seeds(seeds)
    metrics = eng.run(max_iters=CRAWL_ITERS)
    elapsed = time.monotonic() - t0
    crawled = sum(m.get("admitted", 0) for m in metrics)
    return {
        "urls_per_sec": round(crawled / elapsed, 2),
        "iters": len(metrics),
        "urls": crawled,
        "elapsed_sec": round(elapsed, 2),
    }


def main() -> None:
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    from dmp_crawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    timings = run_suite(spark, sf_dir)
    crawl = run_crawl_bench(spark, tempfile.mkdtemp(prefix="bench_crawl_"))
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "crawl": crawl,
    }))


def scaling() -> None:
    """N vs 4N evidence: run the crawl bench at local[8] and local[32] in
    separate subprocesses (one Spark master per process), report
    efficiency = (T32_rate) / (4 * T8_rate)."""
    import subprocess

    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, BENCH_MODE="crawl_only")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8 = results["8"]["crawl"]["urls_per_sec"]
    r32 = results["32"]["crawl"]["urls_per_sec"]
    eff = round(r32 / (4 * r8), 3)
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "urls_per_sec_local8": r8,
        "urls_per_sec_local32": r32,
        "pass_ge_0.8": eff >= 0.8,
    }))


def crawl_only() -> None:
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from dmp_crawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench_crawl")
    crawl = run_crawl_bench(spark, tempfile.mkdtemp(prefix="bench_crawl_"))
    print(json.dumps({"metric": "crawl_urls_per_sec", "value": crawl["urls_per_sec"],
                      "unit": "urls/sec", "crawl": crawl}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif os.environ.get("BENCH_MODE") == "crawl_only":
        crawl_only()
    else:
        main()
