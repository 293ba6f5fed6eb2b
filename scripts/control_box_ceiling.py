"""Spark-free box-ceiling control for the N -> 4N scaling pairs.

The sandbox VM saturates shared memory bandwidth before 32 cores
(BENCH/BASELINE.md §1 "box ceiling"): any allocation/string-heavy
workload stops scaling regardless of engine. This control measures that
ceiling for the EXACT per-page work the crawl's fused fetch+extract
stage does at HEAD — `templates.build_page` (page synthesis, the
simulated HTTP body) + href-regex link discovery + `py_resolve_link`
per href + `oracle.extract` (the jsoup-parity field extraction) — under
bare `multiprocessing`, no Spark, no JVM, no I/O.

Fixed work per process (K pages each), so N procs do N*K pages total:
speedup(N1->N2) = (N2*K/t2) / (N1*K/t1), efficiency = speedup/(N2/N1).
Whatever this prints is the most ANY engine could show on the same pair
on this box for this workload class; the crawl bench's measured pair
efficiency should be read against it, not against 1.0.

Usage: python scripts/control_box_ceiling.py [pairs] [pages_per_proc]
  pairs: comma/semicolon list like "8:32" or "2:8;8:32" (default "2:8;8:32")
  pages_per_proc: default 3000
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_URLS = 2_000_000  # same id-space as the scaling workload


def _work(args):
    start_idx, k = args
    # import inside the child so each proc pays its own import, like a
    # freshly forked pyspark worker under the preload daemon (modules are
    # already warm in the parent; fork inherits them COW — same shape).
    import re

    from dmp_crawler_spark.corpus import templates
    from dmp_crawler_spark.extractors import oracle
    from dmp_crawler_spark.extractors.udfs import _HREF_RE
    from dmp_crawler_spark.frontier.urlnorm import py_resolve_link

    href_re = re.compile(_HREF_RE)
    n_links = 0
    n_results = 0
    for j in range(k):
        idx = (start_idx + j * 9973) % N_URLS
        page = templates.build_page(idx, N_URLS)
        html = page["html_str"]
        src = page["url"]
        for m in href_re.finditer(html):
            py_resolve_link(src, m.group(1))
            n_links += 1
        n_results += len(oracle.extract(src, html))
    return n_links, n_results


def run_level(procs: int, pages_per_proc: int) -> dict:
    jobs = [(i * 1_000_003, pages_per_proc) for i in range(procs)]
    t0 = time.monotonic()
    with mp.get_context("fork").Pool(procs) as pool:
        totals = pool.map(_work, jobs, chunksize=1)
    dt = time.monotonic() - t0
    pages = procs * pages_per_proc
    return {
        "procs": procs,
        "pages": pages,
        "sec": round(dt, 2),
        "pages_per_sec": round(pages / dt, 1),
        "links": sum(t[0] for t in totals),
        "results": sum(t[1] for t in totals),
    }


def main() -> None:
    pairs_arg = sys.argv[1] if len(sys.argv) > 1 else "2:8;8:32"
    pages_per_proc = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    pairs = [tuple(int(x) for x in p.split(":"))
             for p in pairs_arg.replace(",", ";").split(";") if p]
    levels = sorted({n for p in pairs for n in p})
    # warm parent imports once so every fork inherits them (daemon analog)
    _work((0, 1))
    measured = {n: run_level(n, pages_per_proc) for n in levels}
    out = {"metric": "box_ceiling_per_page_work", "levels": measured, "pairs": {}}
    for lo, hi in pairs:
        sp = measured[hi]["pages_per_sec"] / measured[lo]["pages_per_sec"]
        out["pairs"][f"{lo}->{hi}"] = {
            "speedup": round(sp, 2),
            "efficiency": round(sp / (hi / lo), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
