"""Physical-plan inspection helpers.

The reference's golden plan tests snapshot EXPLAIN output
(`/root/reference/planner/core/testdata/*_suite_{in,out}.json`); Spark
plan strings are version-sensitive, so per SURVEY §7.3.4 we assert
coarse SHAPE properties instead: filter/column pushdown reached the
scan, the right join strategy was chosen, aggregates split into
partial/final, codegen covers the pipeline. These are the 100 TB
efficiency invariants — a plan that loses them regresses at scale
long before it regresses at sf0.1.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — evidence of column pruning."""
    plan = plan_string(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema:\s*(\S+)", plan)]


def scan_column_counts(df: DataFrame) -> list[int]:
    return [s.count(":") for s in read_schemas(df)]


def join_strategies(df: DataFrame) -> list[str]:
    plan = plan_string(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two HashAggregate levels = map-side partial + final (the
    reference hand-builds this split, executor/aggregate.go:97-133;
    Catalyst inserts it automatically)."""
    plan = plan_string(df)
    return len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)) >= 2


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen pipelines (simple-mode `*(N)`
    markers). Wider/fewer stages = more work fused per row batch."""
    return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, mode="simple"))))


def has_top_n(df: DataFrame) -> bool:
    """Catalyst plans ORDER BY+LIMIT as TakeOrderedAndProject — the
    engine-side TopN (reference: executor/sort.go:148 TopNExec)."""
    return "TakeOrderedAndProject" in plan_string(df)


def executed_metrics(df: DataFrame) -> list[tuple[str, int | None, str]]:
    """EXECUTE the DataFrame's physical plan and return per-operator
    runtime metrics, depth-first: (tree-indented operator name,
    actual output rows, metric summary).

    The EXPLAIN ANALYZE backbone (reference analog: ExplainExec +
    runtime stats, executor/explain.go:25,
    planner/core/common_plans.go:156 — TinySQL renders estimates only;
    executed metrics are TiDB's EXPLAIN ANALYZE, added here as a
    natural engine extension). Execution runs distributed —
    ``plan.execute().count()`` drives the final RDD without funneling
    result rows through the driver, so analyzing a huge SELECT costs
    the query, not the query plus a collect.

    AQE wrappers (AdaptiveSparkPlan, *QueryStage) are traversed into
    their FINAL materialized plans, so the rendered tree is the plan
    that actually ran, with runtime-coalesced/skew-split exchanges.
    """
    jdf = df._jdf  # type: ignore[attr-defined]
    qe = jdf.queryExecution()
    plan = qe.executedPlan()
    # run the plan to populate SQLMetrics; RDD count, no driver rows
    plan.execute().count()

    out: list[tuple[str, int | None, str]] = []

    def metric_pairs(node) -> list[tuple[str, int]]:
        pairs = []
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                pairs.append((kv._1(), int(kv._2().value())))
        except Exception:
            pass
        return pairs

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        pairs = dict(metric_pairs(node))
        act_rows = pairs.pop("numOutputRows", None)
        # the interesting, nonzero remainder — time/memory/io first
        keyorder = (
            "aggTime", "pipelineTime", "shuffleWriteTime", "fetchWaitTime",
            "peakMemory", "spillSize", "dataSize", "shuffleRecordsWritten",
            "recordsRead", "numPartitions", "numFiles", "filesSize",
        )
        shown = [(k, pairs[k]) for k in keyorder if pairs.get(k)]
        shown += [
            (k, v) for k, v in sorted(pairs.items())
            if v and k not in keyorder
        ]
        summary = ", ".join(f"{k}={v}" for k, v in shown[:6])
        out.append(("  " * depth + name, act_rows, summary))
        cls = node.getClass().getName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
            return
        if "QueryStageExec" in cls or name.endswith("QueryStage"):
            walk(node.plan(), depth + 1)
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)

    walk(plan, 0)
    return out
