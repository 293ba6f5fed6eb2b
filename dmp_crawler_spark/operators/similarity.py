"""Similarity search over an embedding column (array<float>).

 - brute_force_topk: exact cosine top-k. Plan: broadcast the (small) query
   set, cross join against the corpus (narrow — no shuffle of the corpus),
   per-query top-k via window. Baseline for recall evaluation.
 - ivf_topk: the scale path — IVF-style inverted-file index: k-means-ish
   centroids picked deterministically (hash-sampled corpus vectors),
   corpus partitioned by nearest centroid (one shuffle, reused across
   queries), queries probe only n_probe cells. At 10^10 vectors the probe
   join touches n_probe/n_cells of the data instead of all of it.

All vector math is JVM-side (zip_with/aggregate); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dmp_crawler_spark.operators.dedup import _widen_scan, cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank)."""
    # sub-MB fixture corpus = one parquet split: widen so the per-row
    # cosine stage runs cluster-wide (no-op at real scale)
    corpus = _widen_scan(corpus)
    scored = corpus.crossJoin(
        F.broadcast(queries.select(query_id_col, query_vec_col))
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_sim(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _nearest_centroid(vec_col, centroids_col):
    """Index (1-based) of the nearest centroid by cosine."""
    sims = F.transform(centroids_col, lambda c: cosine_sim(vec_col, c))
    return F.array_position(sims, F.array_max(sims)).cast("int")


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> tuple[DataFrame, list]:
    """Assign every vector to its nearest of n_cells centroid vectors.
    Returns (indexed corpus with `cell` column, centroids list).
    Deterministic: by default centroids are the corpus vectors with the
    n_cells smallest xxhash64(id) values (a seeded sample, no RNG state);
    pass `centroids` to use a pre-trained coarse quantizer instead (the
    FAISS-style split between training the quantizer and building the
    inverted file — at 10^10 vectors the quantizer is trained once on a
    sample and reused across index rebuilds)."""
    if centroids is None:
        sampled = (
            corpus.select(
                id_col, vec_col, F.xxhash64(F.col(id_col).cast("string")).alias("h")
            )
            .orderBy("h")
            .limit(n_cells)
            .collect()
        )
        centroids = [list(r[vec_col]) for r in sampled]
    elif len(centroids) != n_cells:
        raise ValueError(
            f"{len(centroids)} pre-trained centroids != n_cells={n_cells}"
        )
    cent_col = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    # the n_cells-way nearest-centroid scan is the per-row hot cost of the
    # index build — widen a single-split fixture corpus first (no-op at
    # real scale)
    corpus = _widen_scan(corpus)
    indexed = corpus.withColumn("cell", _nearest_centroid(F.col(vec_col), cent_col))
    return indexed, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: list,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the n_probe nearest cells per query; exact cosine within."""
    cent_col = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    sims = F.transform(cent_col, lambda c: cosine_sim(F.col(query_vec_col), c))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
        F.slice(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        sims,
                        F.sequence(F.lit(1), F.lit(len(centroids))),
                        lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
                    )
                ),
                lambda st: st["cell"],
            ),
            1, n_probe,
        ).alias("probe_cells"),
    ).select("query_id", "qvec", F.explode("probe_cells").alias("cell"))

    scored = indexed.join(F.broadcast(q), "cell").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_sim(F.col(vec_col), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
