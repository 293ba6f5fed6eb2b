"""S9 — the Solr index sink, Spark-native.

The reference pushes extracted articles into Solr for keyword search
(…/common/SolrUtil.java addIndex calls from e.g.
…/crawler/ms/Crawler4Zhishiku.java:210-217). There is no Solr in a
Spark-first deployment; the equivalent capability is a searchable
inverted-index TABLE: a (term, id, tf) posting list the extraction sink
appends to, plus a ranked term-match query over it. At scale the posting
table is written bucketed by `term` so a query's term filter prunes
buckets; ranking is distributed top-K (orderBy().limit(), never an
unpartitioned Window over all matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_search_index(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(term, id, tf) posting table: lowercase whitespace tokens, term
    frequency per document. One explode + one partial-aggregating groupBy."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))


def write_search_index(index: DataFrame, table: str, path: str,
                       n_buckets: int = 64) -> None:
    """Persist the posting table bucketed+sorted by term: a query's term
    lookup scans only the matching buckets, and repeated searches join
    without a shuffle (bucketed table ≈ the Solr index directory)."""
    (
        index.write.mode("overwrite")
        .bucketBy(n_buckets, "term").sortBy("term")
        .option("path", path)
        .saveAsTable(table)
    )


def search(index: DataFrame, query: str, k: int = 10) -> DataFrame:
    """Ranked term-match: docs matching the most distinct query terms
    first (AND-leaning), then total term frequency, id as tie-break.
    The literal isin() filter reaches the posting-table scan (predicate
    pushdown / bucket pruning); the ranking is a distributed top-K."""
    terms = [t for t in query.lower().split() if t]
    scored = (
        index.filter(F.col("term").isin(terms))
        .groupBy("id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").alias("score"),
        )
    )
    topk = scored.orderBy(
        F.col("n_terms").desc(), F.col("score").desc(), F.col("id").asc()
    ).limit(k)
    # rank assignment runs on ≤ k rows — the single-task window is bounded
    w = Window.orderBy(
        F.col("n_terms").desc(), F.col("score").desc(), F.col("id").asc()
    )
    return topk.withColumn("rank", F.row_number().over(w))
