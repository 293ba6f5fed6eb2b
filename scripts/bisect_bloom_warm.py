"""Warm-context bisect for the bloom build_shards anti-scaling: the
standalone build is flat across cores (scripts/bisect_bloom_config.py:
~3-4 s at local[8] AND local[32], plain or bench config), but inside the
crawl bench at local[32] the identical build measured 117.7 s
(BENCH/scaling_8_32_r04_interleaved.json). The remaining difference is
warm-session state: the fused fetch stage leaves N reused Python workers
(memo caches, imported extractor stack) that applyInPandas re-enters.

This script replays that shape: run GeneratorFetcher.fetch_extract over
`n_fetch` URLs first (same worker warm-up as a crawl iteration), then time
build_shards on a synthetic 1.5M-row seen layout in the SAME session.

Usage: python scripts/bisect_bloom_warm.py <cores> [n_fetch] [n_rows]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = sys.argv[1]
n_fetch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_500_000

from pyspark.sql import functions as F  # noqa: E402

from dmp_crawler_spark.session import get_spark  # noqa: E402

spark = get_spark(master=f"local[{cores}]", app_name="bisect_bloom_warm")
spark.sparkContext.setLogLevel("WARN")

from dmp_crawler_spark.corpus import generator, templates  # noqa: E402
from dmp_crawler_spark.frontier import bloom  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import FRONTIER_SCHEMA, SEEN_SCHEMA  # noqa: E402

base = f"/tmp/bisect_bloom_warm_{cores}"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)

# --- phase 1: fused fetch over n_fetch URLs (the worker warm-up) --------
fetcher = generator.GeneratorFetcher(spark, n_fetch)
admitted = (
    spark.createDataFrame(
        [(templates.url_for(i, n_fetch),) for i in range(n_fetch)],
        "url string",
    )
    .withColumn("host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
    .withColumn("host_hash", F.xxhash64("host"))
    .withColumn("depth", F.lit(0))
    .withColumn("discovery_iter", F.lit(0))
    .withColumn("score", F.lit(0.0))
    .withColumn("retry_count", F.lit(0))
)
# parquet round-trip: the scheduler's admitted set comes from the frontier
# parquet (all-nullable); literal columns here are non-nullable and the
# fused worker nulls some meta fields on link rows
admitted.write.mode("overwrite").parquet(os.path.join(base, "admitted"))
admitted = spark.read.schema(FRONTIER_SCHEMA).parquet(
    os.path.join(base, "admitted")
)
t0 = time.time()
fetcher.fetch_extract(admitted).write.mode("overwrite").parquet(
    os.path.join(base, "fetched")
)
t_fetch = time.time() - t0
print(f"WARM_FETCH cores={cores} n_fetch={n_fetch} sec={t_fetch:.2f}",
      flush=True)

# --- phase 2: build_shards in the same (now warm) session ---------------
N_SHARDS = 16
per_dir = n_rows // 4
for k in range(4):
    (
        spark.range(per_dir)
        .select(
            F.concat(F.lit(f"http://site{k}.example.com/page/"), F.col("id"))
            .alias("url"),
        )
        .select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.xxhash64("url", F.lit(1)).alias("url_hash2"),
            F.xxhash64(F.lit(k), F.col("url")).alias("host_hash"),
            F.lit(k).alias("scheduled_iter"),
        )
        .withColumn("shard", F.pmod("host_hash", F.lit(N_SHARDS)).cast("int"))
        .repartition(N_SHARDS, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(base, f"iter={k:06d}"))
    )

dfs = [
    spark.read.schema(SEEN_SCHEMA)
    .option("basePath", os.path.join(base, f"iter={k:06d}"))
    .parquet(os.path.join(base, f"iter={k:06d}"))
    for k in range(4)
]
seen = dfs[0]
for d in dfs[1:]:
    seen = seen.unionByName(d)

expected = 1 << 16
target = max(1, 2 * n_rows // N_SHARDS)
while expected < target:
    expected *= 2

t0 = time.time()
bloom.build_shards(
    seen, os.path.join(base, "bloom"), N_SHARDS, expected_per_shard=expected
)
dt = time.time() - t0
print(f"WARM_BUILD cores={cores} rows={n_rows} sec={dt:.2f}", flush=True)
spark.stop()
