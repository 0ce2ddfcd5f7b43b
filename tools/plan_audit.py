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
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bankcreditunion_datapipeline_spark import queries as _q  # noqa: E402
from bankcreditunion_datapipeline_spark.session import build_session  # noqa: E402


def audit_plan(plan: str) -> dict:
    return {
        "python_udf": len(re.findall(r"BatchEvalPython", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "shuffles": len(re.findall(r"Exchange (hash|range|single)partitioning", plan)),
        "global_sorts": len(re.findall(r"\bSort \[.*\], true,", plan)),
        "arrow_python": len(re.findall(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", plan)),
        "take_ordered": len(re.findall(r"TakeOrderedAndProject", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-audit")
    failures: list[str] = []
    for name, q in sorted(_q.registry().items()):
        try:
            df = q.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: PLAN ERROR {e}")
            continue
        a = audit_plan(plan)
        flags = []
        if a["python_udf"]:
            flags.append(f"PYTHON_UDF x{a['python_udf']}")
            failures.append(f"{name}: row-at-a-time Python UDF in plan")
        if a["cartesian"]:
            flags.append(f"CARTESIAN x{a['cartesian']}")
            failures.append(f"{name}: CartesianProduct in plan")
        info = (
            f"shuffles={a['shuffles']} sorts={a['global_sorts']} "
            f"arrow={a['arrow_python']} topk={a['take_ordered']}"
        )
        print(f"{'FLAG' if flags else 'ok  '}  {name}: {info} {' '.join(flags)}")
    spark.stop()
    if failures:
        print("\nVIOLATIONS:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("\nno hard violations")


if __name__ == "__main__":
    main()
