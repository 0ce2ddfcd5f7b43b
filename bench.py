"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bankcreditunion_datapipeline_spark import queries as _q
from bankcreditunion_datapipeline_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(app_name="bench")
    registry = _q.registry()

    # Warm the JVM/session on the smallest table so first-query JIT/session
    # startup cost doesn't land on q01, and pre-spawn the Python worker pool
    # (long-lived on a real cluster; `spark.python.worker.reuse` keeps them)
    # so the first Arrow-batched query doesn't pay 32 interpreter+numpy
    # startups.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _warm(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_warm, "id long").count()

    # Best-of-2 per query: the second run amortizes JIT/codegen-cache and
    # scan-index warmup so timings reflect steady-state plan cost, not
    # first-touch noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    # storage-cache high-water mark across the run (VERDICT r13 #3): the
    # bounded transient sweep (caching.py) is the policy; this records the
    # measurement SCALE.md cites. One py4j introspection call per query --
    # microseconds, never on a query plan path.
    from bankcreditunion_datapipeline_spark.caching import storage_status

    hwm = {"n_cached_rdds": 0, "mem_bytes": 0, "disk_bytes": 0, "n_transients": 0}
    for name, q in sorted(registry.items()):
        best = None
        n = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = q.spark_fn(spark, sf_dir)
                n = df.count()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
            timings[name] = round(best, 3)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# {name}: ERROR {e}", file=sys.stderr)
        try:
            # diagnostic only: a query error above may have broken the
            # session/gateway, and the HWM probe must never abort the
            # remaining queries (the sidecar is written after the loop)
            st = storage_status(spark)
            for k in hwm:
                hwm[k] = max(hwm[k], st[k])
        except Exception as e:  # noqa: BLE001
            print(f"# storage_status: ERROR {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    ordered = sorted(v for v in timings.values() if v >= 0)
    median = round(ordered[len(ordered) // 2], 3) if ordered else 0.0
    n_ok = len(ordered)

    # The harness keeps only the last ~2000 chars of stdout and parses the
    # JSON from that.  The per-query map outgrew that window at ~180
    # queries, so the FULL-precision map now lives in a committed sidecar
    # (BENCH_SIDECAR.json, full query names, 3-decimal timings) that the
    # cross-round fence workflow and the judge read from the round's
    # closing commit; the captured line carries totals + the worst-N
    # queries + the sidecar pointer, a deterministic ~500 chars at ANY
    # registry size.
    # r15 (VERDICT r14 #2): a scaling run at a lower core count used to
    # OVERWRITE the main run's sidecar (the only full per-query record),
    # which emptied PERF's per_query/geomean/scaling blocks. Now every
    # run ALSO writes a per-core-count sidecar and embeds `cpus`; the
    # canonical BENCH_SIDECAR.json path is kept so existing pointers
    # resolve. Additions-only: timing methodology unchanged.
    from bankcreditunion_datapipeline_spark.session import default_parallelism

    cpus = default_parallelism()
    payload = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "avg_query_sec": round(total / n_ok, 3) if n_ok else 0.0,
        "median_query_sec": median,
        "storage_hwm": hwm,
        "queries": timings,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    paths = [os.path.join(here, f"BENCH_SIDECAR_c{cpus}.json")]
    main_path = os.path.join(here, "BENCH_SIDECAR.json")
    # never clobber a higher-core (main-run) record with a low-core
    # scaling run -- that is exactly what emptied PERF_r14's per_query
    try:
        with open(main_path) as fh:
            prev_cpus = json.load(fh).get("cpus", 0)
    except Exception:  # noqa: BLE001
        prev_cpus = 0
    if cpus >= prev_cpus:
        paths.append(main_path)
    for sidecar_path in paths:
        with open(sidecar_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print("# full timings: " + json.dumps(timings), file=sys.stderr)

    short = {name.split("_", 1)[0]: round(t, 2) for name, t in timings.items()}
    worst = dict(
        sorted(short.items(), key=lambda kv: -kv[1])[:15]
    )
    line = json.dumps(
        {
            "metric": "total_query_wall_clock",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "cpus": cpus,
            "n_queries": len(timings),
            # corpus grows every round -- normalize totals across rounds
            "avg_query_sec": round(total / n_ok, 3) if n_ok else 0.0,
            "median_query_sec": median,
            "worst": worst,
            "sidecar": "BENCH_SIDECAR.json",
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, f"bench line {len(line)} chars; capture window is ~2000"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
