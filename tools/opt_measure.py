"""Round-14 optimization measurement harness (guide §1).

Times individual registered queries with the bench.py methodology
(best-of-2 `df.count()` on local[$SPARK_GRAFT_CPUS] at $SPARK_GRAFT_SF_DIR)
and/or dumps `explain("formatted")` to plans/r14/<query>_<tag>.txt.

Usage:
  python tools/opt_measure.py time q227_... q243_...      # timings only
  python tools/opt_measure.py explain TAG q227_... ...    # plans only
  python tools/opt_measure.py both TAG q227_... ...       # both

A fresh process per invocation so session-shared lanes start cold, like
the driver's bench. Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bankcreditunion_datapipeline_spark import queries as _q
from bankcreditunion_datapipeline_spark.session import build_session


def main() -> None:
    mode = sys.argv[1]
    if mode in ("explain", "both"):
        tag = sys.argv[2]
        names = sys.argv[3:]
    else:
        tag = None
        names = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = build_session(app_name="opt_measure")
    registry = _q.registry()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _warm(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_warm, "id long").count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        q = registry[name]
        if mode in ("time", "both"):
            best = None
            n = None
            per = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(name)
                t0 = time.perf_counter()
                df = q.spark_fn(spark, sf_dir)
                n = df.count()
                elapsed = time.perf_counter() - t0
                per.append(round(elapsed, 3))
                best = elapsed if best is None else min(best, elapsed)
                spark.sparkContext.setJobDescription(None)
            print(f"TIME {name}: best={best:.3f}s runs={per} rows={n}")
        if mode in ("explain", "both"):
            df = q.spark_fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(txt)
            print(f"PLAN {name} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
