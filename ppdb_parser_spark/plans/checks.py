"""Physical-plan shape assertions (SURVEY.md §4.2/§4.3, §5.3 layer 6).

A query that is correct but plans a BroadcastNestedLoopJoin, loses its
parquet filter pushdown, or falls out of whole-stage codegen will pass the
oracle and still die at 100 TB. These helpers turn the intended plan shape
into regression tests.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_no_nested_loop(df: DataFrame, name: str = "") -> str:
    plan = plan_string(df)
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"{name}: {bad} in physical plan\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame, name: str = "") -> str:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan, f"{name}: expected BroadcastHashJoin\n{plan}"
    return plan


def assert_pushed_filters(df: DataFrame, *fragments: str, name: str = "") -> str:
    """Assert the parquet scan received pushdown filters mentioning each
    fragment (column name)."""
    plan = plan_string(df)
    assert "PushedFilters: [" in plan, f"{name}: no pushed filters\n{plan}"
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and "[]" not in line
    ]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"{name}: filter on {frag!r} not pushed\n{plan}"
    return plan


def assert_codegen(df: DataFrame, name: str = "") -> str:
    # "codegen" mode compiles the plan immediately (AQE's pre-execution
    # "simple" output hides codegen spans until the first run).
    plan = plan_string(df, "codegen")
    assert "WholeStageCodegen" in plan, f"{name}: no WholeStageCodegen span\n{plan[:2000]}"
    return plan


def assert_take_ordered(df: DataFrame, name: str = "") -> str:
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, (
        f"{name}: expected TakeOrderedAndProject (orderBy+limit)\n{plan}"
    )
    return plan


def assert_partitioned_windows(df: DataFrame, *keys: str, name: str = "") -> str:
    """Every window in the plan is partitioned (by one of ``keys`` when
    given) — an unpartitioned window funnels ALL rows through one task and
    is the canonical silent scale-killer."""
    plan = plan_string(df, "extended")
    specs = [
        seg for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, f"{name}: no window in plan\n{plan}"
    for seg in specs:
        # spec layout: windowspecdefinition(p1, p2, ..., o1 ASC ..., o2
        # DESC ..., specifiedwindowframe(...)) — parse only up to the
        # frame marker, then split into partition tokens (everything
        # strictly before the first ASC/DESC-marked column) vs ordering
        # tokens. A key matched inside the ORDER BY does NOT count.
        head = seg.split("specifiedwindowframe(")[0]
        tokens = [t.strip() for t in head.split(",") if t.strip()]
        part_tokens: list[str] = []
        for t in tokens:
            if " ASC" in t or " DESC" in t:
                break
            part_tokens.append(t)
        assert part_tokens, f"{name}: unpartitioned window spec: {head}"
        if keys:
            assert any(k in t for k in keys for t in part_tokens), (
                f"{name}: window not partitioned by {keys}: {head}"
            )
    return plan


def assert_partition_pruned(df: DataFrame, col: str, name: str = "") -> str:
    """The parquet scan prunes directory partitions: a non-empty
    ``PartitionFilters`` on ``col`` must reach the scan node (at 100 TB
    this is the difference between reading one partition and all of them)."""
    plan = plan_string(df)
    hit = any(
        "PartitionFilters: [" in line and col in line and "[]" not in line
        for line in plan.splitlines()
    )
    assert hit, f"{name}: no partition filter on {col} reached the scan\n{plan}"
    return plan


def unbounded_cross_joins(df: DataFrame, max_bounded_rows: int = 8) -> list[str]:
    """Return a description of every Cross join in the OPTIMIZED logical
    plan where NEITHER side has a bounded row count (``maxRows``) of at
    most ``max_bounded_rows``.

    1-row broadcast contexts (grouping-free aggregates: probe vectors,
    codebooks, totals) report ``maxRows = Some(1)`` and are legitimate —
    they are maps, not products. A Cross join between two unbounded
    relations is the 100 TB scale-killer this sweep exists to catch.
    """
    jplan = df._jdf.queryExecution().optimizedPlan()
    hits: list[str] = []

    def bounded(node) -> bool:
        mr = node.maxRows()
        return mr.isDefined() and int(mr.get()) <= max_bounded_rows

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Join":
            if node.joinType().toString() == "Cross":
                kids = node.children()
                sides = [kids.apply(i) for i in range(kids.length())]
                if not any(bounded(s) for s in sides):
                    hits.append(
                        "Cross join, maxRows="
                        + str(
                            [
                                int(s.maxRows().get())
                                if s.maxRows().isDefined()
                                else None
                                for s in sides
                            ]
                        )
                    )
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i))

    walk(jplan)
    return hits
