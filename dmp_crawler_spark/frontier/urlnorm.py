"""URL normalization + host-hash columns (all JVM-side Column expressions).

The reference leans on crawler4j's URLCanonicalizer; here normalization is
declarative so Catalyst keeps it inside whole-stage codegen:

  - strip fragment, lowercase scheme+host, drop default port
  - resolve relative hrefs against the source URL (crawler4j absUrl)
  - host + host_hash = xxhash64(host) — the partitioning key the whole
    engine shuffles on (north rule: salted host-hash partitioning)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(c, F.lit("HOST")))


def host_hash_of(url: Column | str) -> Column:
    return F.xxhash64(host_of(url))


def normalize_url(url: Column | str) -> Column:
    """Strip fragment + query-empty '?', lowercase scheme+host."""
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?$", "")
    scheme_host = F.lower(F.regexp_extract(c, r"^(https?://[^/]+)", 1))
    rest = F.regexp_replace(c, r"^https?://[^/]+", "")
    return F.when(scheme_host != "", F.concat(scheme_host, rest)).otherwise(c)


def resolve_link(src: Column | str, href: Column | str) -> Column:
    """crawler4j/jsoup absUrl: absolute stays; '/x' joins scheme://host;
    'x' joins the source directory; '//host/x' inherits scheme."""
    s = F.col(src) if isinstance(src, str) else src
    h = F.col(href) if isinstance(href, str) else href
    scheme = F.regexp_extract(s, r"^(https?)://", 1)
    base = F.regexp_extract(s, r"^(https?://[^/]+)", 1)
    src_dir = F.regexp_extract(s, r"^(https?://.*/)[^/]*$", 1)
    return (
        F.when(h.rlike(r"^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(base, h))
        .otherwise(F.concat(src_dir, h))
    )


def with_url_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach (host, host_hash) — the engine's partition key columns."""
    return df.withColumn("host", host_of(url_col)).withColumn(
        "host_hash", F.xxhash64(F.col("host"))
    )


def salted_partition(host_hash: Column | str, n_partitions: int, salt_buckets: int = 1,
                     url: Column | str | None = None) -> Column:
    """Partition id with optional per-host salting: hot hosts (Zipf head)
    spread over `salt_buckets` partitions so one domain can't pin an
    executor; politeness caps are applied per-host before this, so the
    split never violates ordering semantics."""
    hh = F.col(host_hash) if isinstance(host_hash, str) else host_hash
    if salt_buckets <= 1 or url is None:
        return F.pmod(hh, F.lit(n_partitions))
    u = F.col(url) if isinstance(url, str) else url
    salt = F.pmod(F.xxhash64(u), F.lit(salt_buckets))
    return F.pmod(hh + salt, F.lit(n_partitions))
