"""Bisect the bloom build_shards local[32] anti-scaling between session
configs: `plain` (the fast repro session) vs `bench` (dmp_crawler_spark.
session.get_spark — the config the crawl bench runs under, where
BENCH/scaling_8_32_r04_interleaved.json measured bloom_build 117.7 s at
local[32] vs 1.9 s at local[8]).

Usage: python scripts/bisect_bloom_config.py <cores> <plain|bench> [n_rows]
        [extra_conf k=v ...]   # extra_conf overrides applied on top
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = sys.argv[1]
mode = sys.argv[2]
n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_500_000
extra = dict(kv.split("=", 1) for kv in sys.argv[4:])

from pyspark.sql import SparkSession, functions as F  # noqa: E402

if mode == "bench":
    from dmp_crawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", app_name="bisect_bloom",
                      extra_conf=extra)
else:
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("bisect_bloom")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
spark.sparkContext.setLogLevel("WARN")

from dmp_crawler_spark.frontier import bloom  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import SEEN_SCHEMA  # noqa: E402

N_SHARDS = 16
base = f"/tmp/bisect_bloom_{cores}_{mode}"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)

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
print(f"BISECT cores={cores} mode={mode} extra={extra} rows={n_rows} "
      f"sec={dt:.2f}")
spark.stop()
