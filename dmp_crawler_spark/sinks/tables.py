"""Result sinks: the wide-column → typed-table boundary.

The reference writes 3-level maps (rowkey → family → col → bytes) to HBase
(…/common/HBaseTools.java:98-121, …/crawler/BaseCrawler.java:28-55). The
engine's extraction stage emits the same shape as rows
(url, rowkey, family, cols map<string,string>); this module provides

 - append_wide: append the wide rows to a parquet/Iceberg-style table dir
   partitioned by family (one family ≈ one reference table),
 - pivot_family: turn one family's map rows into a typed columnar table
   (the schema per family comes from SURVEY.md §1.2's sink inventory),
 - merge_latest: rowkey-upsert semantics (HBase put-overwrite analog) as a
   window dedup keeping the newest write per (rowkey, family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# family → ordered column list, from the reference's sink tables (SURVEY §1.2)
FAMILY_SCHEMAS: dict[str, list[str]] = {
    "auto_info": ["name", "style", "price", "level", "engine", "gearbox",
                  "size", "struct", "speed", "fuel"],
    "user_info": ["name", "sex", "city", "following", "followers"],
    "post_info": ["bbs_id", "bbs_name", "post_id", "post_title",
                  "post_content", "post_date"],
    "dealer_info": ["name", "brand", "address", "latlon"],
    "product_info": ["product_brand", "product_name", "product_code",
                     "shopname", "displayname", "classifications"],
    "article_info": ["article_title", "article_auther", "article_content",
                     "article_time"],
    "route_info": ["route_name", "route_type"],
    "article": ["category", "title", "content"],
    "stock_info": ["stockid", "stockname", "stockplate"],
}


def append_wide(results: DataFrame, path: str) -> None:
    """Append extraction output partitioned by family — family-pruned scans
    read only their own files (partition pruning ≈ one HBase table each)."""
    results.write.mode("append").partitionBy("family").parquet(path)


def pivot_family(results: DataFrame, family: str,
                 columns: list[str] | None = None) -> DataFrame:
    """(rowkey, cols map) rows of one family → typed columns. Map access is
    a JVM expression (element_at), so the pivot costs no shuffle at all."""
    cols = columns or FAMILY_SCHEMAS[family]
    out = results.filter(F.col("family") == family).select(
        "rowkey",
        *[F.element_at("cols", c).alias(c) for c in cols],
    )
    return out


def merge_latest(results: DataFrame, order_col: str = "crawl_iter") -> DataFrame:
    """HBase put-overwrite semantics: keep the newest row per (rowkey, family)."""
    w = Window.partitionBy("rowkey", "family").orderBy(F.col(order_col).desc())
    return (
        results.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
