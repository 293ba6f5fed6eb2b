"""A/B evidence for salted hot-host admission (round-4 verdict #4).

The north rule calls for salted host-hash partitioning because a Zipf-hot
host can hold a large fraction of the pending frontier, and a plain
Window.partitionBy(host) rank puts ALL of that host's rows in ONE task.
politeness.admit(n_salts=K) computes the identical admitted set in two
phases (salt-local top-budget superset, then exact rank on survivors) —
identity is pytest-asserted (tests/test_frontier.py), but until round 5
no bench showed the skew case the path exists FOR.

This harness builds a frontier where one host holds a configurable share
(default 50%) of the pending set, then interleaves plain vs salted
admission runs (A,B,A,B,…) on the same materialized parquet input and
reports per-repeat wall times + an exact admitted-set identity check
(bidirectional exceptAll). Expected shape: plain admit is bound by the
single hot-host sort task regardless of cores; salted admit spreads the
hot host over n_salts tasks and stays flat.

Usage:
  PYTHONPATH=/root/repo python scripts/skew_admission_ab.py \
      [--rows 8000000] [--hot-frac 0.5] [--salts 32] [--budget 100] \
      [--repeats 3] [--out BENCH/skew_admission_ab_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dmp_crawler_spark.frontier import politeness  # noqa: E402
from dmp_crawler_spark.session import get_spark  # noqa: E402


def build_frontier(spark, rows: int, hot_frac: float, path: str) -> None:
    """Zipf-extreme pending set: one host owns hot_frac of all rows, the
    rest spread uniformly over 50k cold hosts. Priority-key columns are
    varied so the rank sort does real work."""
    cut = int(rows * hot_frac)
    df = spark.range(0, rows, numPartitions=64).select(
        F.concat(F.lit("http://"),
                 F.when(F.col("id") < cut, F.lit("hot.example.com")).otherwise(
                     F.concat(F.lit("h"), (F.col("id") % 50000).cast("string"),
                              F.lit(".example.com"))),
                 F.lit("/p/"), F.col("id").cast("string"),
                 F.lit(".html")).alias("url"),
        F.when(F.col("id") < cut, F.lit("hot.example.com")).otherwise(
            F.concat(F.lit("h"), (F.col("id") % 50000).cast("string"),
                     F.lit(".example.com"))).alias("host"),
        F.xxhash64(F.when(F.col("id") < cut, F.lit("hot.example.com")).otherwise(
            F.concat(F.lit("h"), (F.col("id") % 50000).cast("string"),
                     F.lit(".example.com")))).alias("host_hash"),
        (F.col("id") % 5).cast("int").alias("depth"),
        (F.col("id") % 7).cast("int").alias("discovery_iter"),
        ((F.col("id") % 100) / 10.0).alias("score"),
        F.lit(0).alias("retry_count"),
    )
    df.write.mode("overwrite").parquet(path)


def timed_admit(spark, path: str, budget: int, n_salts):
    fr = spark.read.parquet(path)
    t0 = time.monotonic()
    out = politeness.admit(fr, budget, n_salts=n_salts)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("url"))).alias("crc_sum"),
    ).collect()[0]
    return time.monotonic() - t0, int(agg["n"]), int(agg["crc_sum"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salts", type=int, default=32)
    ap.add_argument("--budget", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="skew_admission_ab")
    tmp = tempfile.mkdtemp(prefix="skew_ab_")
    path = os.path.join(tmp, "frontier")
    build_frontier(spark, args.rows, args.hot_frac, path)

    # exact identity once (bidirectional anti semantics on full rows)
    fr = spark.read.parquet(path)
    plain = politeness.admit(fr, args.budget, n_salts=None)
    salted = politeness.admit(fr, args.budget, n_salts=args.salts)
    only_plain = plain.exceptAll(salted).count()
    only_salted = salted.exceptAll(plain).count()

    runs: list[dict] = []
    # interleave A/B so background drift hits both arms equally
    for rep in range(args.repeats):
        for label, salts in (("plain", None), ("salted", args.salts)):
            sec, n, crc = timed_admit(spark, path, args.budget, salts)
            runs.append({"arm": label, "repeat": rep, "sec": round(sec, 3),
                         "admitted": n, "crc_sum": crc})
            print(json.dumps(runs[-1]))

    def med(arm):
        xs = sorted(r["sec"] for r in runs if r["arm"] == arm)
        return xs[len(xs) // 2]

    crcs = {r["arm"]: r["crc_sum"] for r in runs}
    ns = {r["arm"]: r["admitted"] for r in runs}
    out = {
        "metric": "salted_admission_skew_ab",
        "rows": args.rows,
        "hot_frac": args.hot_frac,
        "salts": args.salts,
        "per_host_budget": args.budget,
        "cpus": int(cpus),
        "identity": {
            "exceptAll_plain_minus_salted": only_plain,
            "exceptAll_salted_minus_plain": only_salted,
            "admitted_equal": only_plain == 0 and only_salted == 0,
            "count_plain": ns.get("plain"),
            "count_salted": ns.get("salted"),
            "crc_equal": crcs.get("plain") == crcs.get("salted"),
        },
        "median_sec": {"plain": med("plain"), "salted": med("salted")},
        "speedup": round(med("plain") / med("salted"), 3),
        "runs": runs,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
