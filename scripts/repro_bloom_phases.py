"""Phase-isolated repro for the bloom build_shards anti-scaling
(BENCH/scaling_8_32_r04_head.json: 290 s at local[32] vs 2 s at local[8]).

Times, separately, on the same synthetic seen layout as repro_bloom_build:
  scan_count   — pure parquet scan + count (JVM only)
  jvm_group    — groupBy(shard).count() (shuffle + JVM agg)
  pandas_noop  — groupBy(shard).applyInPandas returning 1 row, no numpy
  full_build   — bloom.build_shards (the real path)

Usage: python scripts/repro_bloom_phases.py <cores> [n_rows]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = sys.argv[1] if len(sys.argv) > 1 else "32"
n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName("repro_bloom_phases")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from dmp_crawler_spark.frontier import bloom  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import SEEN_SCHEMA  # noqa: E402

N_SHARDS = 16
base = f"/tmp/repro_bloomp_{cores}"
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

def mk_seen():
    dfs = [
        spark.read.schema(SEEN_SCHEMA)
        .option("basePath", os.path.join(base, f"iter={k:06d}"))
        .parquet(os.path.join(base, f"iter={k:06d}"))
        for k in range(4)
    ]
    seen = dfs[0]
    for d in dfs[1:]:
        seen = seen.unionByName(d)
    return seen

results = {}

t0 = time.time()
n = mk_seen().count()
results["scan_count"] = time.time() - t0

t0 = time.time()
(
    mk_seen()
    .withColumn("shard", F.pmod("host_hash", F.lit(N_SHARDS)).cast("int"))
    .select("shard", "url_hash")
    .groupBy("shard")
    .count()
    .collect()
)
results["jvm_group"] = time.time() - t0

def noop(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                         "n": [len(pdf)]})

t0 = time.time()
(
    mk_seen()
    .withColumn("shard", F.pmod("host_hash", F.lit(N_SHARDS)).cast("int"))
    .select("shard", "url_hash")
    .groupBy("shard")
    .applyInPandas(noop, "shard int, n long")
    .collect()
)
results["pandas_noop"] = time.time() - t0

expected = 1 << 16
target = max(1, 2 * n // N_SHARDS)
while expected < target:
    expected *= 2

t0 = time.time()
bloom.build_shards(
    mk_seen(), os.path.join(base, "bloom"), N_SHARDS,
    expected_per_shard=expected,
)
results["full_build"] = time.time() - t0

# repeat full_build to see warm behavior
t0 = time.time()
bloom.build_shards(
    mk_seen(), os.path.join(base, "bloom2"), N_SHARDS,
    expected_per_shard=expected,
)
results["full_build_warm"] = time.time() - t0

print(f"PHASES cores={cores} rows={n} " +
      " ".join(f"{k}={v:.2f}s" for k, v in results.items()))
spark.stop()
