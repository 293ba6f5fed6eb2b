"""Per-stage profile of the crawl loop's frontier_write phase.

Runs the bench crawl workload for 2 iterations (warm-up + steady), then
re-executes the steady iteration's link-discovery -> rules -> bloom ->
anti-join -> write chain stage-by-stage, timing each cut. This is the
bisect evidence the round-2 verdict asked for (phase-level, not one
contested number).

Usage: PYTHONPATH=/root/repo python scripts/profile_frontier.py [n_urls]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dmp_crawler_spark.corpus import generator, templates  # noqa: E402
from dmp_crawler_spark.frontier import bloom  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import (  # noqa: E402
    EXT_BLACKLIST,
    CrawlEngine,
)
from dmp_crawler_spark.frontier.urlnorm import (  # noqa: E402
    normalize_url,
    resolve_link,
    with_url_cols,
)
from dmp_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="profile_frontier")
    tmp = tempfile.mkdtemp(prefix="profile_frontier_")

    seeds = spark.createDataFrame(
        [(templates.url_for((i * 131) % n, n), "") for i in range(10000)],
        "seed string, site string",
    )
    eng = CrawlEngine(
        spark, os.path.join(tmp, "state"),
        generator.GeneratorFetcher(spark, n),
        generator.generate_site_rules(spark),
        per_host_budget=200, n_bloom_shards=16,
    )
    eng.init_from_seeds(seeds)
    m1 = eng.step()  # warm-up iteration
    m2 = eng.step()  # steady iteration (what the bench measures)
    print("iter1 phase_sec:", json.dumps(m1["phase_sec"]))
    print("iter2 phase_sec:", json.dumps(m2["phase_sec"]))

    # ---- replay iteration 3's frontier_write chain, stage by stage ----
    ck = eng.last_checkpoint()
    k = ck["iter"] + 1
    frontier = eng.frontier_view(ck["iter"], ck.get("frontier_base"))
    from dmp_crawler_spark.frontier import politeness
    admitted = politeness.admit(
        frontier, eng.per_host_budget, global_budget=None, n_salts=None
    ).select("url", "host", "host_hash", "depth", "discovery_iter", "score",
             "retry_count").cache()
    admitted.count()

    cdir = eng._p("combined", f"iter={k:06d}")
    t0 = time.time()
    eng.fetcher.fetch_extract(admitted).write.mode("overwrite").partitionBy(
        "kind").parquet(cdir)
    t_fuse = time.time() - t0
    combined = spark.read.parquet(cdir)

    timings: dict[str, float] = {"fetch_extract_write": round(t_fuse, 2)}

    def cut(name, df):
        t0 = time.time()
        m = df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        return m

    raw_links = combined.filter(F.col("kind") == "link").select(
        F.col("url"), F.col("out_url"), F.col("depth"))
    cut("A_link_scan_only", raw_links)

    resolved = raw_links.select(
        normalize_url(resolve_link("url", "out_url")).alias("url"),
        F.col("depth").alias("parent_depth"))
    cut("B_resolve_normalize", resolved)

    filtered = resolved.filter(~F.col("url").rlike(EXT_BLACKLIST))
    uniq = filtered.groupBy("url").agg(F.min("parent_depth").alias("parent_depth"))
    cut("C_uniq_groupby", uniq)

    cand = (
        uniq.join(F.broadcast(eng.site_rules),
                  F.expr("url rlike url_regex"), "inner")
        .groupBy("url", "parent_depth")
        .agg(F.max("score").alias("score"))
        .withColumn("depth", F.col("parent_depth") + 1)
        .drop("parent_depth")
    )
    cut("D_rules_join", cand)

    cand2 = (
        with_url_cols(cand)
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("url_hash2", F.xxhash64("url", F.lit(1)))
    )
    tagged = bloom.prefilter(cand2, ck.get("bloom_manifest"))
    cut("E_bloom_prefilter", tagged)

    seen = eng.seen_df(ck["iter"], ck.get("seen_compact"))
    new_entries = (
        bloom.dedup_candidates(cand2, seen, ck.get("bloom_manifest"),
                               n_shards=eng.n_bloom_shards)
        .withColumn("discovery_iter", F.lit(k))
        .withColumn("retry_count", F.lit(0))
        .select("url", "host", "host_hash", "depth", "discovery_iter",
                "score", "retry_count")
    )
    cut("F_full_dedup", new_entries)

    # LSM frontier maintenance: the per-iteration write is the O(Δ) delta
    # + O(admitted) tombstones in one partitioned job, never a full rewrite
    nul = [
        F.lit(None).cast(t).alias(c)
        for c, t in (("url", "string"), ("host", "string"),
                     ("host_hash", "long"), ("depth", "int"),
                     ("discovery_iter", "int"), ("score", "double"))
    ]
    tombs = admitted.select(
        *nul, F.col("retry_count"),
        F.xxhash64("url").alias("url_hash"),
        F.xxhash64("url", F.lit(1)).alias("url_hash2"),
        F.lit("tomb").alias("kind"),
    )
    adds = new_entries.select(
        "*",
        F.lit(None).cast("long").alias("url_hash"),
        F.lit(None).cast("long").alias("url_hash2"),
        F.lit("add").alias("kind"),
    )
    t0 = time.time()
    adds.unionByName(tombs).write.mode("overwrite").partitionBy("kind").parquet(
        eng._p("frontier", "logPROF"))
    timings["G_delta_tomb_write"] = round(time.time() - t0, 2)

    print(json.dumps({"n_urls": n, "stage_sec": timings}))


if __name__ == "__main__":
    main()
