"""End-to-end training-assembly pipeline (__spark_entry__.assemble_training):
decontaminate → domain mix → seeded shuffle → pack, composed as one query.
The oracle gate checks value-exactness vs DuckDB; these tests pin the
SEMANTIC invariants a shard writer depends on, plus the plan shape."""

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _run(spark) -> pd.DataFrame:
    return entry.assemble_training(spark, SF).toPandas()


def test_assembly_drops_all_benchmark_members(spark):
    """Every doc in the held-out slice (doc_id % 97 == 0) is 100%
    self-contaminated by construction and must be gone from the output."""
    out = _run(spark)
    assert len(out) > 0
    assert (out.doc_id % 97 == 0).sum() == 0
    # and the drop is real: some eligible docs existed in the input
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert (docs.doc_id % 97 == 0).sum() > 0


def test_assembly_positions_dense_and_cumsum_consistent(spark):
    """Within each shard: pos is exactly 1..n, and start_off equals the
    running sum of preceding n_tokens in pos order (the contiguous layout
    packing promises)."""
    out = _run(spark)
    for shard, g in out.groupby("shard"):
        g = g.sort_values("pos")
        assert list(g.pos) == list(range(1, len(g) + 1))
        expect_off = g.n_tokens.cumsum().shift(fill_value=0)
        assert (g.start_off.values == expect_off.values).all()
        assert (g.first_seq == g.start_off // 1024).all()


def test_assembly_epochs_follow_rates(spark):
    """Copies per surviving doc = its source's deterministic rate:
    rate_bp // 10000 (+1 for bucketed docs). Zero-rate sources are
    entirely absent; upsampled sources emit multiple epochs."""
    out = _run(spark)
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "source"]]
    per_doc = out.groupby("doc_id").epoch.max()
    merged = docs.set_index("doc_id").join(per_doc, how="inner")
    import hashlib

    def rate_bp(source):
        return (int(hashlib.md5(source.encode()).hexdigest()[:4], 16) % 4) * 8750

    def copies(doc_id, bp):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 10000
        return bp // 10000 + (1 if b < bp % 10000 else 0)

    for doc_id, row in merged.iterrows():
        assert row.epoch == copies(doc_id, rate_bp(row.source)), doc_id
    # zero-rate sources never appear
    zero_sources = {s for s in docs.source.unique() if rate_bp(s) == 0}
    if zero_sources:
        survivors = set(docs[docs.source.isin(zero_sources)].doc_id)
        assert not (set(out.doc_id) & survivors)


def test_assembly_plan_no_global_sort(spark):
    """The layout must come from per-shard window work, never a global
    sort / range partitioning — that is what keeps the assembly viable
    at 10^10 rows."""
    df = entry.assemble_training(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert plan.count("Exchange hashpartitioning") >= 1
