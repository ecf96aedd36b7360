"""Plan inspection helpers (used by the plan-assertion tests)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, full_metadata: bool = True) -> str:
    spark = df.sparkSession
    if full_metadata:
        spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    return df._jdf.queryExecution().executedPlan().toString()


def scan_read_schema(df: DataFrame) -> list[set[str]]:
    """The column set of every parquet scan in the plan."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        out.append({c.split(":")[0] for c in m.group(1).split(",") if c})
    return out


def broadcast_subtrees(df: DataFrame, full_metadata: bool = True) -> list[str]:
    """toString of every BroadcastExchange subtree in the executed plan.

    Used to assert which relations a query is willing to materialize on the
    driver: a fact-scaling table (orders/customer/lineitem) under a
    BroadcastExchange is a plan that OOMs at 100x scale.
    """
    spark = df.sparkSession
    if full_metadata:
        spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    out: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            # With AQE on (session default) the root AdaptiveSparkPlanExec is
            # a leaf from children()'s perspective; descend into the current
            # physical plan or the walk sees nothing and the guard is vacuous.
            walk(node.executedPlan())
            return
        if name.startswith("BroadcastExchange"):
            out.append(node.toString())
            return  # nested exchanges inside are part of this subtree
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


_ROW_PRESERVING_OR_REDUCING = ("Filter", "Project", "ColumnarToRow", "InputAdapter")
_GLOBAL_AGG = re.compile(
    r"^(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]"
)


def global_agg_root(subtree: str) -> bool:
    """True iff a BroadcastExchange subtree's root operator is a GLOBAL
    aggregate (keys=[]), possibly under row-preserving-or-reducing wrappers
    (Filter/Project): such a subtree materializes exactly one row at every
    scale factor, so broadcasting it is the standard scalar-carry and never
    a fact-table broadcast -- even when the scan feeding the aggregate is a
    fact table. Used by the fact-broadcast plan lint."""
    for raw in subtree.splitlines():
        line = raw.strip()
        # strip tree-drawing prefixes and the WholeStageCodegen "*(n) " tag
        line = re.sub(r"^[:+\-| ]*", "", line)
        line = re.sub(r"^\*\(\d+\)\s*", "", line)
        if not line or line.startswith("BroadcastExchange"):
            continue
        if line.split("(")[0].split(" ")[0] in _ROW_PRESERVING_OR_REDUCING:
            continue
        return bool(_GLOBAL_AGG.match(line))
    return False


def _resolve(node):
    """Unwrap plan-tree indirections that hide the real operator: the
    adaptive root, query-stage wrappers, exchange reuse, and codegen
    adapters."""
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        return _resolve(node.executedPlan())
    if "QueryStage" in name:  # Broadcast/Shuffle/Result query stages
        return _resolve(node.plan())
    if name.startswith("ReusedExchange"):
        # ReusedExchangeExec is a LEAF node (it references, not owns, the
        # original exchange subtree) -- children() is empty, use child().
        return _resolve(node.child())
    if name.startswith(("InputAdapter", "WholeStageCodegen")):
        return _resolve(node.children().apply(0))
    return node


def nlj_build_side_rows(df: DataFrame) -> list[int]:
    """EXECUTE the query and return the actual numOutputRows of the
    broadcast build side of every BroadcastNestedLoopJoin in the final
    adaptive plan.

    This is the machine-checked complement to the cartesian-guard
    allowlist: an annotation can claim the NLJ's build side is a 1-row
    aggregate or an O(K) dim table, but the runtime metric PROVES it --
    a regression that grows a build side past the bound fails the suite
    even if the query's name is already on the list.

    Execution goes through df.collect() (NOT a noop write, which runs a
    separate QueryExecution and would leave this df's metrics unset) --
    intended for small-SF test fixtures only."""
    df.collect()
    counts: list[int] = []

    def build_rows(child) -> int | None:
        node = _resolve(child)
        if node.nodeName().startswith("BroadcastExchange"):
            return int(node.metrics().apply("numOutputRows").value())
        return None

    def walk(node) -> None:
        node = _resolve(node)
        if node.nodeName().startswith("BroadcastNestedLoopJoin"):
            sides = [
                build_rows(node.children().apply(i))
                for i in range(node.children().length())
            ]
            found = [s for s in sides if s is not None]
            assert found, (
                "BroadcastNestedLoopJoin with no broadcast-exchange child: "
                + node.toString()
            )
            counts.extend(found)
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts
