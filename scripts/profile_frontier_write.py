"""Isolate the frontier-write crossover behind `lsm_min_frontier`.

The fold path writes O(pending) rows per iteration; the LSM path writes
O(delta) + O(admitted) regardless of pending size. This script times
exactly those two writes (same 16k-row delta, same 2.5k-row tombstone
set) against synthetic pending sets of increasing size, so the gate
default can sit at the measured crossover instead of a guess.

Run: PYTHONPATH=/root/repo python scripts/profile_frontier_write.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dmp_crawler_spark.frontier.scheduler import FRONTIER_COLS  # noqa: E402
from dmp_crawler_spark.session import get_spark  # noqa: E402

SIZES = [int(s) for s in os.environ.get(
    "WRITE_PROF_SIZES", "500000,2000000,8000000").split(",")]
N_DELTA = 16_000
N_ADMIT = 2_500


def synth(spark, n: int, start: int = 0):
    return (
        spark.range(start, start + n, 1, 32)
        .select(
            F.concat(F.lit("http://h"), (F.col("id") % 2500).cast("string"),
                     F.lit(".example.com/a/"), F.col("id").cast("string"),
                     F.lit(".html")).alias("url"),
            F.concat(F.lit("h"), (F.col("id") % 2500).cast("string"),
                     F.lit(".example.com")).alias("host"),
            (F.col("id") % 2500).alias("host_hash"),
            (F.col("id") % 4).cast("int").alias("depth"),
            F.lit(0).alias("discovery_iter"),
            F.lit(1.0).alias("score"),
            F.lit(0).alias("retry_count"),
        )
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="profile_fwrite")
    out = []
    root = tempfile.mkdtemp(prefix="fwrite_prof_")
    for n in SIZES:
        pending = synth(spark, n)
        pending.write.mode("overwrite").parquet(f"{root}/pending_{n}")
        pending_w = spark.read.parquet(f"{root}/pending_{n}")
        admitted = synth(spark, N_ADMIT).cache()
        admitted.count()
        delta = synth(spark, N_DELTA, start=n)

        t0 = time.time()
        (
            pending_w.join(admitted.select("url"), "url", "left_anti")
            .select(*FRONTIER_COLS)
            .unionByName(delta)
            .write.mode("overwrite").parquet(f"{root}/fold_{n}")
        )
        fold_sec = round(time.time() - t0, 2)

        nul = [
            F.lit(None).cast(t).alias(c)
            for c, t in (("url", "string"), ("host", "string"),
                         ("host_hash", "long"), ("depth", "int"),
                         ("discovery_iter", "int"), ("score", "double"))
        ]
        t0 = time.time()
        (
            delta.select(
                *FRONTIER_COLS,
                F.lit(None).cast("long").alias("url_hash"),
                F.lit(None).cast("long").alias("url_hash2"),
                F.lit("add").alias("kind"),
            )
            .unionByName(admitted.select(
                *nul, F.col("retry_count"),
                F.xxhash64("url").alias("url_hash"),
                F.xxhash64("url", F.lit(1)).alias("url_hash2"),
                F.lit("tomb").alias("kind"),
            ))
            .write.mode("overwrite").partitionBy("kind")
            .parquet(f"{root}/log_{n}")
        )
        lsm_sec = round(time.time() - t0, 2)
        admitted.unpersist()
        row = {"pending": n, "fold_write_sec": fold_sec,
               "lsm_write_sec": lsm_sec}
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"delta_rows": N_DELTA, "admit_rows": N_ADMIT,
                      "results": out}))


if __name__ == "__main__":
    main()
