"""Shared declarative row-assertion scaffolding.

``assert_rows`` attaches a per-row ``assert_true`` to a DataFrame as a
filter that always keeps the row when the condition holds — the job
fails at ACTION time with a composed message the moment any row
violates the predicate, with no separate validation job and no extra
scan (the check rides whatever stage already reads the row). Used by
the interval operators' NULL/inverted-bounds preconditions and
merge_apply's winner-ambiguity validation (one definition instead of
the three copies flagged in the round-6 review).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assert_rows(df: DataFrame, valid: Column, *msg_parts: Column) -> DataFrame:
    """Return ``df`` with a row-level assertion: rows where ``valid``
    is True (NULL counts as False) pass through unchanged; the first
    violating row aborts the job with the concatenated ``msg_parts``
    (mix ``F.lit`` text with ``col.cast('string')`` values).

    ``assert_true`` yields NULL on success, so the coalesce keeps the
    filter a tautology that Catalyst cannot prune (the column is
    referenced) yet never drops a row."""
    return df.where(
        F.coalesce(
            F.assert_true(valid, F.concat(*msg_parts)).cast("boolean"),
            F.lit(True),
        )
    )


# NOTE: a literal ", " (not \s*) before the lookahead — an optional
# whitespace token lets the regex backtrack to zero-width and sneak the
# lookahead past "unboundedpreceding" (caught by the unit test's
# full-frame negative)
_QUAD_FRAME = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame, "
    r"(?!unboundedpreceding\$)[^,]+, unboundedfollowing\$\(\)\)"
)

# a Window/WindowInPandas PHYSICAL node (not WindowGroupLimit, which is
# the pushed-down rank-limit companion of a Window that is also present)
_WINDOW_NODE = re.compile(r"(?:^|\s)(Window(?:InPandas)? \[.*)$")
_SORT_DIR = re.compile(r" (?:ASC|DESC)\b")


def _top_level_bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` group contents of one plan line (nested
    brackets stay inside their group)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth > 0:
            cur.append(ch)
    return groups


def plan_lint(df: DataFrame) -> list[str]:
    """Static anti-pattern scan of a DataFrame's physical plan — the
    checks the fleet-wide plan audit enforces, packaged for ad-hoc use
    on any plan during development:

      - ``cartesian``: a CartesianProduct (usually a missing join key);
      - ``bnlj``: BroadcastNestedLoopJoin (a non-equi join that will
        not survive a big build side);
      - ``row-python``: BatchEvalPython — row-at-a-time Python UDF in
        the plan (Arrow/pandas forms show as ArrowEvalPython /
        MapInPandas instead);
      - ``quadratic-frame``: a window frame with upper bound UNBOUNDED
        FOLLOWING and a non-unbounded lower bound. Spark evaluates
        these by RESCANNING from the current row to the partition end
        for every row — O(n^2) per partition (measured 8x on a 1M-row
        spine, SCALE.md r7s5). Full both-unbounded frames and running
        frames are fine; rewrite growing-forward hulls as LOCF over
        the DESCENDING order.
      - ``single-reducer-window``: a Window node with an EMPTY
        partition spec — ``row_number()/ntile() OVER (ORDER BY …)``
        and friends. The whole input flows through ONE task whatever
        the cluster size (the round-7 rfm-segmentation `weak`).
        Acceptable only over provably BOUNDED input (a grouped /
        distinct-domain / driver-row table); over data-sized input use
        operators/relational.global_row_number (range shuffle +
        broadcast offsets) or a quantile-crossing formulation.
        Detection: the physical node prints
        ``Window [exprs], [partSpec], [orderSpec]`` — two bracket
        groups (or one) instead of three means no partition columns
        (the order spec is recognized by its ASC/DESC markers).

    Returns a list of finding strings (empty = clean). Findings are
    heuristics over the executed-plan text; whitelisting judgment
    stays with the caller (tests/test_plan_audit.py)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    if "CartesianProduct" in plan:
        out.append("cartesian: CartesianProduct in physical plan")
    if "BroadcastNestedLoopJoin" in plan:
        out.append("bnlj: BroadcastNestedLoopJoin in physical plan")
    if "BatchEvalPython" in plan:
        out.append("row-python: BatchEvalPython (row-at-a-time UDF)")
    for m in _QUAD_FRAME.finditer(plan):
        out.append(f"quadratic-frame: {m.group(0)}")
    for line in plan.splitlines():
        node = _WINDOW_NODE.search(line)
        if not node:
            continue
        groups = _top_level_bracket_groups(node.group(1))
        # 3 groups = [exprs], [partSpec], [orderSpec] — partitioned, OK.
        # 2 groups with sort markers in the 2nd = unpartitioned ordered;
        # 2 groups without = partition-only (OK); 1 group = neither.
        unpart = len(groups) == 1 or (
            len(groups) == 2 and bool(_SORT_DIR.search(groups[1]))
        )
        if unpart:
            out.append(
                "single-reducer-window: " + node.group(1)[:160]
            )
    return out
