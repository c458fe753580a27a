"""Physical-plan auditing: the plan IS the scale contract.

Correct rows say nothing about cost — a flagship that silently loses
its broadcast hint or its parquet pushdown still passes every oracle
check while becoming 100× slower at 100 TB (SURVEY.md §4 discipline).
This module turns `.explain` output into structured features so plan
properties can be asserted in tests, regression-diffed across rounds,
and reported per query (PLANS.md).

The features deliberately come from the *executed/physical* plan
string, not internal APIs: stable across Spark versions in exactly the
way a human reading `.explain("formatted")` is.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# feature name → regex counted in the plan text
_FEATURES: dict[str, str] = {
    "broadcast_hash_join": r"BroadcastHashJoin",
    "sort_merge_join": r"SortMergeJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "broadcast_nested_loop_join": r"BroadcastNestedLoopJoin",
    "cartesian_product": r"CartesianProduct",
    "exchange": r"(?<!Broadcast)Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition",
    "broadcast_exchange": r"BroadcastExchange",
    "reused_exchange": r"ReusedExchange",
    "hash_aggregate": r"HashAggregate",
    "object_hash_aggregate": r"ObjectHashAggregate",
    "sort_aggregate": r"SortAggregate",
    "take_ordered_and_project": r"TakeOrderedAndProject",
    "window": r"\bWindow\b",
    "window_group_limit": r"WindowGroupLimit",
    "global_sort": r"Exchange rangepartitioning",
    "in_memory_scan": r"InMemoryTableScan",
    "python_eval": r"BatchEvalPython|ArrowEvalPython",
    "map_in_pandas": r"MapInPandas",
    "flat_map_groups_in_pandas": r"FlatMapGroupsInPandas",
    "generate_explode": r"\bGenerate\b",
}


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `.explain(mode)` would print."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jmode.fromString(mode))


def plan_features(df: DataFrame) -> dict[str, int | bool]:
    """Counted physical-plan features plus scan-pushdown booleans.

    Counts run over the "simple" plan (one line per operator; the
    "formatted" mode lists every node twice — tree + details — and
    separates Exchange from its partitioning arguments)."""
    text = explain_text(df, "simple")
    out: dict[str, int | bool] = {
        name: len(re.findall(pat, text)) for name, pat in _FEATURES.items()
    }
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    out["scans_with_pushed_filters"] = sum(1 for p in pushed if p.strip())
    out["parquet_scans"] = len(re.findall(r"FileScan parquet", text))
    return out


def assert_plan(
    df: DataFrame,
    *,
    forbid: tuple[str, ...] = ("cartesian_product",),
    require: dict[str, int] | None = None,
) -> dict[str, int | bool]:
    """Assert plan properties; returns the features for further checks.

    ``forbid``: feature names that must count 0.
    ``require``: feature name → minimum count.
    """
    feats = plan_features(df)
    problems = [
        f"forbidden {name} appears {feats[name]}×"
        for name in forbid
        if feats.get(name)
    ]
    for name, at_least in (require or {}).items():
        if int(feats.get(name, 0)) < at_least:
            problems.append(
                f"required {name} ≥ {at_least}, found {feats.get(name, 0)}"
            )
    if problems:
        raise AssertionError("; ".join(problems))
    return feats
