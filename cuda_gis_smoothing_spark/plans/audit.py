"""Executed-plan auditing — the repo's plan discipline as a reusable
check instead of a review-time grep.

Every rule here is a paid-for lesson (CLAUDE.md / BENCH chronology):
nested-loop or cartesian joins must never appear (the 100 TB
death sentence); pair kernels must pin their parallelism with
user-specified repartitions (AQE coalesces cheap-to-ship expensive-
to-process shuffles to ONE partition); multi-consumer derived
subplans re-execute per consumer, so a gate whose plan scans one
table N times is usually missing a localCheckpoint.

``audit_plan`` is text-based over ``executedPlan().toString()`` — the
same strings the committed plan assertions match — so it can run in
CI against any DataFrame without executing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> dict:
    """Count the plan features the house rules constrain.

    Note ``file_scans`` counts the ``FileScan`` operator name only —
    a naive search for both 'FileScan' and 'Scan parquet' double-counts
    every scan (the committed audit trick)."""
    plan = plan_text(df)
    return {
        "file_scans": plan.count("FileScan"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "pinned_repartitions": plan.count("REPARTITION_BY_NUM"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        # ungrouped (1-row) aggregates — the legitimate broadcast sides
        # of the house's crossJoin(broadcast(stats)) pattern. Count
        # FINAL aggregates only: every logical agg prints twice in the
        # executed plan (a partial_ map-side half + the final), so the
        # naive count grants 2× allowance per stats join
        "ungrouped_aggregates": (
            plan.count("Aggregate(keys=[]")
            - plan.count("Aggregate(keys=[], functions=[partial_")
        ),
    }


def assert_no_quadratic_join(
    df: DataFrame, context: str = "", allow_stats_broadcasts: bool = False
) -> None:
    """Raise if the plan contains a cartesian product, or a
    nested-loop join that cannot be the house 1-row-stats pattern.

    ``crossJoin(broadcast(<ungrouped agg>))`` — the intentional 1-row
    stats attach — PLANS as a BroadcastNestedLoopJoin (there is no join
    key to hash on), so a blanket BNL ban would flag 30+ legitimate
    gates. With ``allow_stats_broadcasts`` each BNL must be covered by
    an ungrouped FINAL aggregate somewhere in the plan (the broadcast
    side a 1-row stats join necessarily has; partial halves excluded —
    each logical agg prints twice); an accidental corpus×corpus BNL
    from a dropped join condition has no such aggregate and still
    fails. Residual blind spot: a gate whose OUTPUT is itself a 1-row
    aggregate earns one BNL of allowance it may not deserve — pair
    kernels should call the strict form (default), which is what the
    targeted plan tests do."""
    a = audit_plan(df)
    bad_bnl = (
        a["nested_loop_joins"] > a["ungrouped_aggregates"]
        if allow_stats_broadcasts
        else a["nested_loop_joins"] > 0
    )
    if bad_bnl or a["cartesian_products"]:
        raise AssertionError(
            f"quadratic join in plan{' of ' + context if context else ''}: "
            f"{a['nested_loop_joins']} BroadcastNestedLoopJoin "
            f"(vs {a['ungrouped_aggregates']} ungrouped aggregates), "
            f"{a['cartesian_products']} CartesianProduct\n{plan_text(df)}"
        )
