"""Single-process reference frontier simulator (ordering-parity oracle).

Implements exactly the crawl semantics the Spark engine claims —
BFS-with-priority admission under per-host + global budgets, schedule-time
URL-seen dedup, bounded fetch retry — in plain Python over the same
deterministic corpus (corpus/templates.py). SURVEY.md §5 item 2: the
engine's visit ordering and URL-seen set must equal this simulator's
under the same seed list and budgets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from dmp_crawler_spark.corpus import templates

EXT_BLACKLIST = re.compile(
    r"(?i)\.(css|js|bmp|gif|jpe?g|png|tiff?|mid|mp2|mp3|mp4|wav|avi|mov|mpeg|ram|m4v|pdf|rm|smil|wmv|swf|wma|zip|rar|gz|ico)$"
)
_SEED_RANGE = re.compile(r"^(.*?)\[(\d+)-(\d+)\](.*)$")


def expand_seed(seed: str) -> list[str]:
    m = _SEED_RANGE.match(seed)
    if not m:
        return [seed]
    pre, lo, hi, suf = m.groups()
    return [f"{pre}{i}{suf}" for i in range(int(lo), int(hi) + 1)]


def host_of(url: str) -> str:
    m = re.match(r"https?://([^/]+)", url)
    return m.group(1).lower() if m else ""


@dataclass
class SimState:
    frontier: list[dict] = field(default_factory=list)  # pending entries
    seen: set[str] = field(default_factory=set)
    visit_order: list[tuple[int, str]] = field(default_factory=list)  # (iter, url)
    failed: list[str] = field(default_factory=list)
    crawled_total: int = 0
    iter: int = 0


class FrontierSimulator:
    def __init__(
        self,
        n_urls: int,
        site_rules: list[tuple[str, float]],  # (url_regex, score)
        per_host_budget: int = 4,
        global_budget: int | None = None,
        max_retries: int = 3,
    ):
        self.n_urls = n_urls
        self.rules = [(re.compile(rx), sc) for rx, sc in site_rules]
        self.per_host_budget = per_host_budget
        self.global_budget = global_budget
        self.max_retries = max_retries
        self.corpus_urls = {
            templates.url_for(i, n_urls): i for i in range(n_urls)
        }
        self.state = SimState()

    def _score(self, url: str) -> float | None:
        scores = [sc for rx, sc in self.rules if rx.search(url)]
        return max(scores) if scores else None

    def init_from_seeds(self, seeds: list[str]) -> None:
        urls = sorted({u for s in seeds for u in expand_seed(s)})
        for u in urls:
            self.state.seen.add(u)
            self.state.frontier.append({
                "url": u, "host": host_of(u), "depth": 0,
                "discovery_iter": 0, "score": self._score(u) or 0.0,
                "retry_count": 0,
            })

    def _priority_key(self, e: dict):
        return (e["depth"], e["discovery_iter"], -e["score"], e["url"])

    def step(self) -> dict:
        st = self.state
        k = st.iter + 1
        # per-host admission: rank by priority key within host, take budget
        by_host: dict[str, list[dict]] = {}
        for e in st.frontier:
            by_host.setdefault(e["host"], []).append(e)
        admitted: list[dict] = []
        for host, entries in by_host.items():
            entries.sort(key=self._priority_key)
            admitted.extend(entries[: self.per_host_budget])
        # global budget: total order on the same key
        admitted.sort(key=self._priority_key)
        if self.global_budget is not None:
            remaining = max(0, self.global_budget - st.crawled_total)
            admitted = admitted[:remaining]
        admitted_urls = {e["url"] for e in admitted}

        fetched, missed = [], []
        for e in admitted:
            (fetched if e["url"] in self.corpus_urls else missed).append(e)
        for e in fetched:
            st.visit_order.append((k, e["url"]))

        # discover links (same gate as the engine: blacklist + rule match)
        cand: dict[str, dict] = {}
        for e in fetched:
            idx = self.corpus_urls[e["url"]]
            for out in templates.outlinks_for(idx, self.n_urls):
                if EXT_BLACKLIST.search(out):
                    continue
                sc = self._score(out)
                if sc is None:
                    continue
                c = cand.get(out)
                if c is None:
                    cand[out] = {"depth": e["depth"] + 1, "score": sc}
                else:
                    c["depth"] = min(c["depth"], e["depth"] + 1)

        new_frontier = [e for e in st.frontier if e["url"] not in admitted_urls]
        for e in missed:
            if e["retry_count"] + 1 < self.max_retries:
                e2 = dict(e)
                e2["retry_count"] += 1
                new_frontier.append(e2)
            else:
                st.failed.append(e["url"])
        n_new = 0
        for url in cand:
            if url in st.seen:
                continue
            st.seen.add(url)
            n_new += 1
            new_frontier.append({
                "url": url, "host": host_of(url),
                "depth": cand[url]["depth"], "discovery_iter": k,
                "score": cand[url]["score"], "retry_count": 0,
            })
        st.frontier = new_frontier
        st.crawled_total += len(admitted)
        st.iter = k
        return {
            "admitted": len(admitted), "fetched": len(fetched),
            "new_urls": n_new, "frontier_size": len(new_frontier),
            "done": len(new_frontier) == 0 or len(admitted) == 0,
        }

    def run(self, max_iters: int = 100) -> list[dict]:
        out = []
        for _ in range(max_iters):
            m = self.step()
            out.append(m)
            if m["done"]:
                break
        return out
