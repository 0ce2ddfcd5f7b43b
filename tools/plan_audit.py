"""Physical-plan audit: sweep every registered query's executed plan for
scale anti-patterns. Usage:

    python tools/plan_audit.py [sf_dir]

Hard violations (exit 1):
  - BatchEvalPython      row-at-a-time Python UDF in the plan
  - CartesianProduct     unbounded cross product (broadcast nested-loop
                         against a known-tiny axis is allowed and shows up
                         as BroadcastNestedLoopJoin instead)
Informational (printed, not fatal):
  - shuffle (Exchange) count per query
  - global Sort nodes (fine when semantically required; top-k should be
    TakeOrderedAndProject instead)
  - Arrow Python boundaries (MapInPandas / ArrowEvalPython) -- sanctioned
    extension points, listed so additions stay deliberate

Soft violations (printed with a SOFT flag + end-of-run inventory, exit 0):
  - UNPART_WINDOW: a WindowExec with no partition spec (the physical node
    reads ``Window [exprs], [order]`` instead of ``Window [exprs], [part],
    [order]``; its child is an Exchange SinglePartition).  Over a bounded
    O(groups/days/bins) summary that is survivable; over an entity-grain
    frame (customers, users, distinct doc ids) it is the one systematic
    scale-killer this repo has found (VERDICT r10 finding #1), because the
    whole frame moves through ONE WindowExec task.  The fix pattern is
    operators/ranking.py (distributed_row_number / distributed_ntile /
    distributed_cumsum -- the q133 two-level range-partition prefix sum);
    q64/q212/q223/q246/q308 are the rewired exemplars.  The audit cannot
    know a frame's grain from the plan alone, so this stays soft: the
    inventory is the review surface -- every entry must be a summary-grain
    window or a rewire candidate.  RATCHET (r12): a soft entry whose
    registry doc does not state its O(.) bound is promoted to a HARD
    failure -- the audit now enforces the bounded-grain docstring
    discipline instead of trusting the ROUNDLOG review by hand.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bankcreditunion_datapipeline_spark import queries as _q  # noqa: E402
from bankcreditunion_datapipeline_spark.operators import ranking as _ranking  # noqa: E402
from bankcreditunion_datapipeline_spark.session import build_session  # noqa: E402


def claimed_rank_ops(doc: str) -> set:
    """distributed_* operator names a registry doc (which includes the
    appended bounded-window ledger note) claims as its rewire."""
    return set(re.findall(r"\bdistributed_\w+", doc or ""))


def false_rank_claims(doc: str, called: set) -> list:
    """r13 ratchet (VERDICT r12 #1/#3): q228 proved a stated bound can
    be FALSE while a presence-only check passes -- its note claimed
    distributed_ntile while the query ran a raw global ntile window.
    This verifies the CLAIM, not its presence: a doc that names one or
    more distributed_* rewires of which NONE actually fired while the
    query's DataFrame was built (operators/ranking.py:CALLS, lane hits
    replayed by queries._cached_lane) is a hard failure.  Claiming
    distributed_row_number while firing distributed_cumsum is tolerated
    (both are real two-level rewires -- the failure class is a claimed
    rewire masking a raw window, not a misnamed sibling)."""
    claimed = claimed_rank_ops(doc)
    if claimed and not called:
        return sorted(claimed)
    return []


def unpartitioned_window_lines(plan: str) -> list:
    """Return WindowExec plan lines that have an ORDER spec but no
    partition spec (the single-task global-window shape).

    The physical node prints ``Window [exprs], [partition], [order]``;
    with no partitionBy the middle group is absent, leaving exactly one
    top-level ``], [`` separator AND an order-direction marker (ASC/DESC
    NULLS) in the final bracket group.  A partition-only window
    (``Window [exprs], [partition]`` -- e.g. a full-frame count per key)
    also has one separator but no direction marker and is buckets-way
    parallel, so it is NOT flagged.  ``WindowGroupLimit`` /
    ``WindowInPandas`` do not match ``Window \\[`` (no space-bracket).
    """
    out = []
    for line in plan.splitlines():
        if not re.search(r"\bWindow \[", line) or line.count("], [") != 1:
            continue
        tail = re.search(r"\], \[([^\]]*)\]\s*$", line)
        if tail and re.search(r"\b(ASC|DESC) NULLS", tail.group(1)):
            out.append(line.strip())
    return out


def count_unpartitioned_windows(plan: str) -> int:
    return len(unpartitioned_window_lines(plan))


def audit_plan(plan: str) -> dict:
    return {
        "python_udf": len(re.findall(r"BatchEvalPython", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "shuffles": len(re.findall(r"Exchange (hash|range|single)partitioning", plan)),
        "global_sorts": len(re.findall(r"\bSort \[.*\], true,", plan)),
        "arrow_python": len(re.findall(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", plan)),
        "take_ordered": len(re.findall(r"TakeOrderedAndProject", plan)),
        "unpart_windows": count_unpartitioned_windows(plan),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-audit")
    failures: list[str] = []
    soft: list[str] = []
    for name, q in sorted(_q.registry().items()):
        _ranking.CALLS.clear()
        try:
            df = q.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: PLAN ERROR {e}")
            continue
        a = audit_plan(plan)
        flags = []
        fake = false_rank_claims(q.doc, set(_ranking.CALLS))
        if fake:
            flags.append(f"FALSE_CLAIM {','.join(fake)}")
            failures.append(
                f"{name}: doc claims {', '.join(fake)} but building the "
                "query fired no distributed-rank operator -- a false "
                "bounded-window claim (the q228 class); rewire the query "
                "or correct the doc"
            )
        if a["python_udf"]:
            flags.append(f"PYTHON_UDF x{a['python_udf']}")
            failures.append(f"{name}: row-at-a-time Python UDF in plan")
        if a["cartesian"]:
            flags.append(f"CARTESIAN x{a['cartesian']}")
            failures.append(f"{name}: CartesianProduct in plan")
        if a["unpart_windows"]:
            flags.append(f"SOFT UNPART_WINDOW x{a['unpart_windows']}")
            soft.append(f"{name}: x{a['unpart_windows']}")
            # r12 ratchet (VERDICT r11 #3): a soft window is tolerable
            # ONLY over a documented bounded frame -- the registry doc
            # must name its O(.) bound (e.g. "O(B) replicates",
            # "O(distinct cents)"), or the query must be rewired onto
            # operators/ranking.py. An undocumented soft window is a
            # HARD failure, so the inventory cannot silently grow.
            if "O(" not in (q.doc or ""):
                failures.append(
                    f"{name}: unpartitioned window without a "
                    "bounded-grain 'O(...)' statement in its registry "
                    "doc -- document the summary bound or rewire onto "
                    "operators/ranking.py"
                )
        info = (
            f"shuffles={a['shuffles']} sorts={a['global_sorts']} "
            f"arrow={a['arrow_python']} topk={a['take_ordered']}"
        )
        print(f"{'FLAG' if flags else 'ok  '}  {name}: {info} {' '.join(flags)}")
    spark.stop()
    if soft:
        print(
            f"\nSOFT: unpartitioned-window inventory ({len(soft)} queries; "
            "each must be summary-grain or a ranking.py rewire candidate):"
        )
        for s in soft:
            print(" -", s)
    if failures:
        print("\nVIOLATIONS:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("\nno hard violations")


if __name__ == "__main__":
    main()
