"""Physical-plan introspection helpers — used by tests to assert the
plans are the ones we WANT at scale (pushdown reached the scan, dims
broadcast, top-k avoided a global sort), not just plans that happen
to pass on 60k rows."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the Parquet scan reports a pushed filter containing
    ``fragment``."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema — column pruning
    evidence."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [p.split(":")[0].strip() for p in inner.split(",") if ":" in p]
    return []


def join_kinds(df: DataFrame) -> list[str]:
    """One entry per join operator, from the '(n) Kind' detail
    headers of the formatted plan (the tree section would double-
    count)."""
    import re

    plan = physical_plan(df)
    kinds = []
    for marker in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        kinds += [marker] * len(re.findall(rf"\(\d+\) {marker}\b", plan))
    return kinds


def has_node(df: DataFrame, node: str) -> bool:
    return node in physical_plan(df)


def parquet_scan_counts(df: DataFrame) -> dict[str, int]:
    """How many DISTINCT physical scan nodes read each base parquet
    table — the scale-critical invariant (each extra scan node is a
    full corpus pass at 100 TB).

    Counts the formatted plan's ``(n) Scan parquet`` DETAIL headers
    (one per physical node, printed once regardless of how many times
    the tree section references the node — ReusedExchange subtrees
    and the plans cached inside InMemoryRelation repeat node ids in
    the TREE but not in the details), then attributes each to the
    table named by its ``Location:`` line. Counting raw
    ``<name>.parquet`` substrings instead over-counts path echoes —
    the round-7 tool's heuristic gap.
    """
    import re as _re
    from collections import Counter

    lines = physical_plan(df).splitlines()
    counts: Counter[str] = Counter()
    for i, line in enumerate(lines):
        if _re.match(r"\(\d+\) Scan parquet\b", line.strip()):
            for detail in lines[i + 1 : i + 10]:
                if detail.strip().startswith("(") or not detail.strip():
                    break
                m = _re.search(r"(\w+)\.parquet", detail)
                if m and detail.lstrip().startswith("Location"):
                    counts[m.group(1)] += 1
                    break
    return dict(counts)


def global_windows(df: DataFrame) -> list[str]:
    """Window operators with an EMPTY partition spec in the optimized
    logical plan — the 'Moving all data to a single partition' idiom
    that serializes the whole input through one task at scale. Walks
    the JVM plan tree, so it is immune to plan-string formatting."""
    found: list[str] = []

    def walk(node) -> None:
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            found.append(node.simpleStringWithNodeId())
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())  # noqa: SLF001
    return found
