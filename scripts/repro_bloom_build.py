"""Standalone repro for the bloom build_shards local[32] pathology seen in
BENCH/scaling_8_32_r04_head.json (bloom_build 290 s at local[32] vs 2 s at
local[8], same input). Synthesizes a seen layout identical to
FrontierEngine._write_seen (hive shard partitioning, one file per shard per
iter dir), then times bloom.build_shards at the requested master.

Usage: python scripts/repro_bloom_build.py <cores> [n_rows]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = sys.argv[1] if len(sys.argv) > 1 else "32"
n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName("repro_bloom")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from dmp_crawler_spark.frontier import bloom  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import SEEN_SCHEMA  # noqa: E402

N_SHARDS = 16
base = f"/tmp/repro_bloom_{cores}"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)

# 4 iteration dirs, roughly like seeds + 3 crawl iters at the 2M workload
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
        .withColumn(
            "shard", F.pmod("host_hash", F.lit(N_SHARDS)).cast("int")
        )
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

# expected sizing as scheduler.step computes it
seen_total = n_rows
expected = 1 << 16
target = max(1, 2 * seen_total // N_SHARDS)
while expected < target:
    expected *= 2
print(f"cores={cores} rows={n_rows} expected_per_shard={expected}")

t0 = time.time()
m = bloom.build_shards(
    seen, os.path.join(base, "bloom"), N_SHARDS, expected_per_shard=expected
)
dt = time.time() - t0
print(f"BUILD_SHARDS cores={cores} rows={n_rows} sec={dt:.2f}")
spark.stop()
