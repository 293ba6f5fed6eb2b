"""Measure the LSM frontier against the direct fold in the regime the
gate exists for: pending >> per-iteration delta (steady-state crawl).

The per-round bench crawl is a GROWING 3-iteration crawl (delta is
roughly the whole frontier) — that is the below-gate regime where the
direct fold wins (BENCH/BASELINE.md §2d). This script builds the
opposite shape: a large seeded pending set (150k rows) drained with a
tight politeness budget (per_host_budget=1 over ~2.5k hosts), so each
iteration admits ~2% of pending and discovers little. It runs the
IDENTICAL workload twice — lsm_min_frontier=0 (always LSM) and =10^12
(always fold) — and prints per-iteration frontier_write/admit phase
times plus totals. The claim under test: fold's frontier_write is
O(pending) per iteration, LSM's is O(delta) (+ a bounded compaction
every compact_frontier_every iterations).

Run: PYTHONPATH=/root/repo python scripts/profile_lsm.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dmp_crawler_spark.corpus import generator, templates  # noqa: E402
from dmp_crawler_spark.frontier.scheduler import CrawlEngine  # noqa: E402
from dmp_crawler_spark.session import get_spark  # noqa: E402

N_URLS = int(os.environ.get("LSM_PROF_URLS", "500000"))
N_SEEDS = int(os.environ.get("LSM_PROF_SEEDS", "150000"))
ITERS = int(os.environ.get("LSM_PROF_ITERS", "10"))


def run_mode(spark, name: str, lsm_min: int) -> dict:
    seeds = spark.createDataFrame(
        [(templates.url_for(i, N_URLS), "") for i in range(N_SEEDS)],
        "seed string, site string",
    )
    state = tempfile.mkdtemp(prefix=f"lsm_prof_{name}_")
    eng = CrawlEngine(
        spark, state, generator.GeneratorFetcher(spark, N_URLS),
        generator.generate_site_rules(spark),
        per_host_budget=1, n_bloom_shards=16,
        lsm_min_frontier=lsm_min,
    )
    eng.init_from_seeds(seeds)
    per_iter = []
    for _ in range(ITERS):
        m = eng.step()
        if m.get("done"):
            break
        per_iter.append({
            "admitted": m["admitted"],
            "new_urls": m["new_urls"],
            "frontier_size": m["frontier_size"],
            "phase_sec": m["phase_sec"],
        })
        print(f"{name} ITER {json.dumps(per_iter[-1])}", flush=True)
    keys = ("admit", "frontier_write", "seen_write", "metrics_counts")
    totals = {
        k: round(sum(it["phase_sec"].get(k, 0.0) for it in per_iter), 2)
        for k in keys
    }
    totals["frontier_compact"] = round(
        sum(it["phase_sec"].get("frontier_compact", 0.0) for it in per_iter), 2
    )
    return {"mode": name, "iters": len(per_iter), "totals": totals,
            "per_iter": per_iter}


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="profile_lsm")
    out = {}
    for name, lsm_min in (("lsm", 0), ("fold", 10 ** 12)):
        out[name] = run_mode(spark, name, lsm_min)
    print(json.dumps({
        "n_urls": N_URLS, "n_seeds": N_SEEDS,
        "summary": {m: out[m]["totals"] for m in out},
    }))


if __name__ == "__main__":
    main()
