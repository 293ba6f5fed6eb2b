"""Deterministic seeded corpus shuffle + shard assignment
(operators.training.shuffle_shards): the training-order shuffle every
LLM-corpus build runs between packing inputs and writing shards. The
whole point is determinism — the same (seed, id) always lands in the
same shard at the same position regardless of input partitioning or
cluster size, so a resumed/retried 10^10-row job reproduces the exact
byte stream."""

import pytest
from pyspark.sql import functions as F

from dmp_crawler_spark.operators import training


def _docs(spark, n=500, parts=4):
    return spark.range(0, n, numPartitions=parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shuffle_deterministic_across_partitionings(spark):
    a = training.shuffle_shards(_docs(spark, 500, 1), n_shards=8, seed=42)
    b = training.shuffle_shards(
        _docs(spark, 500, 16).repartition(32), n_shards=8, seed=42
    )
    ra = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert ra == rb
    assert len(ra) == 500


def test_shuffle_positions_dense_per_shard(spark):
    """Positions within each shard are exactly 1..count(shard) — dense,
    no gaps, no duplicates (the property a shard writer needs to lay
    out records back-to-back)."""
    out = training.shuffle_shards(_docs(spark), n_shards=8, seed=7)
    per = (
        out.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("nd"),
        )
        .collect()
    )
    assert len(per) == 8  # 500 docs over 8 md5 buckets: all non-empty
    for r in per:
        assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"])


def test_shuffle_seed_changes_order_not_membership(spark):
    a = training.shuffle_shards(_docs(spark), n_shards=4, seed=1)
    b = training.shuffle_shards(_docs(spark), n_shards=4, seed=2)
    ra = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert set(ra) == set(rb)
    moved = sum(1 for k in ra if ra[k] != rb[k])
    assert moved > 400  # a different seed is a genuinely different permutation


def test_shuffle_roughly_uniform(spark):
    """md5 buckets spread: no shard holds more than 3x its fair share
    (loose bound — this is a smoke test for accidental constant keys)."""
    out = training.shuffle_shards(_docs(spark, 2000), n_shards=16, seed=0)
    sizes = [r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 16
    assert max(sizes) < 3 * (2000 / 16)


def test_shuffle_carries_payload_columns(spark):
    out = training.shuffle_shards(_docs(spark, 50), n_shards=4, seed=9)
    assert set(out.columns) == {"doc_id", "text", "shard", "pos"}
    r = out.filter(F.col("doc_id") == 17).collect()
    assert len(r) == 1 and r[0]["text"] == "text-17"


def test_shuffle_plan_single_exchange_no_global_sort(spark):
    """One hash exchange on the shard key; ordering is per-shard window
    work — a global Sort/range-partition in this plan would serialize a
    10^10-row shuffle through one ordering."""
    out = training.shuffle_shards(_docs(spark), n_shards=8, seed=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 1
    assert "rangepartitioning" not in plan.lower()


def test_shuffle_rejects_bad_shards(spark):
    with pytest.raises(ValueError):
        training.shuffle_shards(_docs(spark, 10), n_shards=0, seed=1)
