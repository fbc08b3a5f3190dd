"""Optimization-round profiler (guide §1): time declared queries in
isolation, count the Spark jobs each launches, and dump
``.explain("formatted")`` for the plan audit.

Per query it reports min-of-N wall seconds (same protocol as bench.py),
the number of jobs the *measured* run launched (job floors are the local
wall for most store/stream scripts, so the job count is the number to
move), and writes ``plans/$SPARK_GRAFT_PLAN_DIR/<query>_<tag>.txt`` when asked.

Usage:
    python scripts/opt_profile.py [--tag before] [--runs 2] [--plans] q1 q2 ...
    python scripts/opt_profile.py --all            # every bench headline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from shortcut_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/<dir>/<q>_<tag>.txt")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--json", default=None, help="also dump results as JSON")
    args = ap.parse_args()

    spark = get_spark("opt-profile")
    sc = spark.sparkContext
    queries = entry_mod.queries()
    names = args.names
    if args.all:
        import bench as bench_mod

        names = [n for n, _ in bench_mod.HEADLINE]

    # warm the session the same way bench.py does
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()
    entry_mod._cached_store(
        spark, SF_DIR, "lineitem", (("l_returnflag", "hash"), ("l_quantity", "btree"))
    )

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13"))
    if args.tag:
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        times: list[float] = []
        jobs_for_min = None
        for i in range(args.runs):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            times.append(round(dt, 3))
            if times[-1] == min(times):
                jobs_for_min = njobs
        best = min(times)
        out[name] = {"sec": best, "runs": times, "jobs": jobs_for_min}
        print(f"{name:32s} {best:7.3f}s  jobs={jobs_for_min:<4d} runs={times}", flush=True)
        if args.tag:
            try:
                df2 = fn(spark, SF_DIR)
                txt = df2._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:  # streaming DFs cannot explain after stop
                with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(f"(explain unavailable: {e})\n")

    total = round(sum(v["sec"] for v in out.values()), 2)
    print(f"TOTAL {total}s over {len(out)} queries")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"total": total, "queries": out}, f, indent=1)


if __name__ == "__main__":
    main()
