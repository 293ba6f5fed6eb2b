"""robots.txt rule evaluation as a broadcast join + prefix filter.

The reference explicitly disables robots (…/main/CrawlerManager.java:88-89),
so the engine makes robots additive and toggleable: ordering-parity runs
use respect_robots=False; production runs evaluate the rule table.

Rule table shape (FIXTURES.md §3):
  robots(host, user_agent, rule('allow'|'disallow'), path_prefix, crawl_delay_ms)

Physical plan: the rule table is aggregated per host (tiny) and broadcast;
the longest-prefix match runs as JVM array expressions on the frontier side
— zero shuffles of the frontier, which matters when the frontier is 10^10
rows and robots is ~10^6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _longest_match(prefixes: Column, path: Column) -> Column:
    """Length of the longest prefix in `prefixes` matching `path`; null if none."""
    hits = F.filter(prefixes, lambda p: path.startswith(p))
    return F.when(F.size(hits) > 0, F.array_max(F.transform(hits, F.length)))


def apply_robots(frontier: DataFrame, robots: DataFrame,
                 user_agent: str = "*") -> DataFrame:
    """Drop disallowed URLs, attach crawl_delay_ms.

    Longest-prefix-match: a URL is dropped iff some disallow prefix
    matches and no allow prefix of ≥ length matches. Hosts with no rules
    are allowed (crawler default).
    """
    per_host = (
        robots.filter(F.col("user_agent").isin(user_agent, "*"))
        .groupBy("host")
        .agg(
            F.collect_list(
                F.when(F.col("rule") == "disallow", F.col("path_prefix"))
            ).alias("dis_prefixes"),
            F.collect_list(
                F.when(F.col("rule") == "allow", F.col("path_prefix"))
            ).alias("allow_prefixes"),
            F.max(
                F.when(F.col("rule") == "allow", F.col("crawl_delay_ms"))
            ).alias("crawl_delay_ms"),
        )
    )
    path = F.regexp_replace(F.col("url"), r"^https?://[^/]+", "")
    joined = frontier.join(F.broadcast(per_host), "host", "left")
    dis_len = _longest_match(F.coalesce("dis_prefixes", F.array()), path)
    allow_len = _longest_match(F.coalesce("allow_prefixes", F.array()), path)
    return (
        joined.withColumn("__dis", dis_len)
        .withColumn("__allow", allow_len)
        .filter(
            F.col("__dis").isNull()
            | (F.col("__allow").isNotNull() & (F.col("__allow") >= F.col("__dis")))
        )
        .drop("__dis", "__allow", "dis_prefixes", "allow_prefixes")
    )
