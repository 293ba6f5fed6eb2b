"""Physical-plan inspection helpers — the '.explain and iterate' loop as code.

Used by the perf tests to pin the plans we want: broadcast joins stay
broadcast, filters reach the parquet scan (PushedFilters), column pruning
keeps fat columns (html) out of shuffles, and whole-stage codegen spans
cover the relational stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — pruning check."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(c.split(":")[0] for c in inner.split(",") if c)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def wholestage_codegen_ids(df: DataFrame, execute: bool = True) -> int:
    """Count of WholeStageCodegen spans. Under AQE the final plan (and its
    codegen markers) only exists after an action runs on THIS DataFrame's
    query execution (a write creates a different one), so collect().
    Test-sized inputs only."""
    if execute:
        df.collect()
    plan = physical_plan(df)
    # codegen'd operators print as '*(n) Op' in the simple plan string
    import re

    return len(set(re.findall(r"\*\((\d+)\)", plan))) or plan.count("WholeStageCodegen")
