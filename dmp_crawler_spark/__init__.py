"""dmp_crawler_spark — a PySpark-native distributed crawl + extraction engine.

Brand-new implementation (NOT a port) of the capabilities of the reference
`holiday519/dmp-crawler` (Java crawler suite): URL frontier + scheduler with
bloom-filter URL-seen set, per-host politeness budgets, robots evaluation,
priority queue over (depth, discovery_ts, score), a pages store, and
per-site extraction rewritten as vectorized pandas/Arrow UDFs.

Everything here is built on the public Apache Spark DataFrame/SQL API.
"""

__version__ = "0.1.0"
