"""Positive probe that the warmed preload daemon is serving worker forks.

Runs a mapInPandas stage whose UDF inspects its own process BEFORE
touching the engine stack: with the stock ``pyspark.daemon`` a fresh
no-reuse fork has neither ``dmp_crawler_spark.extractors.oracle`` in
``sys.modules`` nor a frozen gc generation; with
``dmp_crawler_spark.daemon_preload`` both are inherited from the daemon.
Prints one JSON line with the per-partition observations.

Usage (either path must report warm=True, frozen>0):
  PYTHONPATH=. python scripts/probe_daemon.py            # in-process session
  /opt/spark/bin/spark-submit --master 'local[8]' \
      --py-files dist/dmp_crawler_spark.zip scripts/probe_daemon.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmp_crawler_spark.session import get_spark  # noqa: E402

# Submit-mode detection: only hand master="" to get_spark when this
# process was actually launched by spark-submit (its Py4J gateway env is
# present), not merely in a shell that once sourced spark-env (round-4
# advice: SPARK_ENV_LOADED leaks through exports and then 'A master URL
# must be set' kills a plain `python scripts/probe_daemon.py`).
# PROBE_MASTER overrides either way.
_submitted = "PYSPARK_GATEWAY_PORT" in os.environ or "SPARK_APPLICATION_ID" in os.environ
spark = get_spark(master=os.environ.get("PROBE_MASTER", "" if _submitted else None),
                  app_name="probe_daemon")


def probe(batches):
    # observe BEFORE importing anything from the engine: these can only
    # be present if the daemon preloaded them in the parent process
    import gc
    import sys as wsys

    warm = "dmp_crawler_spark.extractors.oracle" in wsys.modules
    frozen = gc.get_freeze_count()
    pid = os.getpid()
    import pandas as pd

    for _ in batches:
        yield pd.DataFrame({"warm": [warm], "frozen": [frozen], "pid": [pid]})


df = spark.range(0, 64, numPartitions=16).mapInPandas(
    probe, "warm boolean, frozen long, pid long")
rows = df.collect()
out = {
    "workers": len({r.pid for r in rows}),
    "warm_all": all(r.warm for r in rows),
    "frozen_min": min(r.frozen for r in rows),
    "daemon_engaged": all(r.warm for r in rows) and min(r.frozen for r in rows) > 0,
}
print(json.dumps(out))
spark.stop()
