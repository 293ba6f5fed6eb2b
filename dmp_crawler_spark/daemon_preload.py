"""Python-worker daemon that pre-imports the heavy per-task stack.

With ``spark.python.worker.reuse=false`` (required on this Spark 4.1
build: the reused-worker handoff intermittently loses its wakeup under
high local concurrency — see ``session.py`` and BENCH/BASELINE.md §2o)
every task runs in a fresh fork of the Python daemon. The fork itself is
~1 ms, but a bare ``pyspark.daemon`` only has ``pyspark.worker`` imported,
so each task re-imports pandas / pyarrow / the extractor stack (~2 s of
CPU) on first UDF deserialization. Measured on the 2M-URL crawl at
local[8], that re-import tax cost ~30% of steady throughput
(5,101 → 3,560 URLs/s).

This module is pointed at by ``spark.python.daemon.module``: it imports
the heavy modules ONCE in the daemon process, exercises the hot
first-call paths (pandas block construction, Arrow <-> pandas round-trip,
one extractor pass) so lazily-built dispatch caches exist before the
fork, then runs the stock ``pyspark.daemon`` manager loop. Every forked
worker inherits the warm modules + caches copy-on-write, so no-reuse
mode pays neither the stall nor the import/warmup tax. ``gc.freeze()``
moves the preloaded heap into the permanent generation so forked
children's first collections don't copy-on-write every inherited page.
Imports that are unavailable in a given deployment degrade silently —
the daemon must come up no matter what, and the worker will fall back
to importing on demand.

Fork-safety: none of the preloaded modules starts live threads at import
time (pyarrow's CPU/IO pools and pandas' BLAS pools are lazy / register
atfork handlers), which is the same contract the stock reused-worker
path relies on when it forks after a first task has imported them.
"""

from __future__ import annotations

for _mod in (
    # the per-task heavy hitters, in dependency order
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.pandas_compat",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
    # this engine's worker-side stack (fused fetch/extract, html mini-DOM,
    # corpus generator used by the bench fetcher)
    "dmp_crawler_spark.extractors.htmlmini",
    "dmp_crawler_spark.extractors.udfs",
    "dmp_crawler_spark.extractors.oracle",
    "dmp_crawler_spark.corpus.templates",
    "dmp_crawler_spark.corpus.generator",
):
    try:  # pragma: no cover - exercised via the live daemon, not pytest
        __import__(_mod)
    except Exception:
        pass

def _warm_first_call_paths() -> None:
    """Exercise the lazily-built caches the first UDF call would pay for.

    Module import alone leaves a lot on the table: pandas builds block
    managers / dtype registries on first DataFrame construction, pyarrow
    builds its pandas-conversion dispatch on first round-trip, and the
    extractor memoizes tag/template state on first parse. Doing one tiny
    pass of each here means every forked worker starts with those caches
    already populated (copy-on-write, shared until mutated).
    """
    try:
        import pandas as pd
        import pyarrow as pa

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        tbl = pa.Table.from_pandas(df)
        tbl.to_pandas()
        pa.ipc.new_stream(pa.BufferOutputStream(), tbl.schema)
    except Exception:
        pass
    try:
        from dmp_crawler_spark.extractors import htmlmini

        htmlmini.parse("<html><body><div id='a'><p>hi</p></div></body></html>")
    except Exception:
        pass
    try:
        import gc

        gc.collect()
        gc.freeze()  # preloaded heap -> permanent generation: child GCs
        # won't trace (and so COW-fault) these pages.
    except Exception:
        pass


_warm_first_call_paths()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
