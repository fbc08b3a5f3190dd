"""Per-step job/wall breakdown of the store_put shape (guide §1):
create / index / insert, plus the insert's internal actions via job
descriptions. Usage: python scripts/put_probe.py [runs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shortcut_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from shortcut_spark.store import Store

    spark = get_spark("put-probe")
    sc = spark.sparkContext
    spark.range(1_000_000).select(F.sum("id")).collect()
    li = os.path.join(SF_DIR, "lineitem.parquet")
    schema = spark.read.parquet(li).schema

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(runs):
        print(f"--- run {r} ---", flush=True)

        def step(name, fn):
            group = f"pp_{r}_{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            ids = sc.statusTracker().getJobIdsForGroup(group)
            print(f"  {name:22s} {dt:7.3f}s jobs={len(ids)}", flush=True)
            return out

        st = step(
            "create",
            lambda: Store.create(
                spark, tempfile.mkdtemp(prefix="pp_") + "/s", schema
            ),
        )
        step("index(hash)", lambda: st.index("l_orderkey", "hash"))
        df = spark.read.parquet(li)
        step("insert(600k)", lambda: st.insert(df))
        # job-level detail of the insert
        for jid in sorted(sc.statusTracker().getJobIdsForGroup(f"pp_{r}_insert(600k)")):
            info = sc.statusTracker().getJobInfo(jid)
            print(f"    job {jid}: stages={list(info.stageIds)}", flush=True)


if __name__ == "__main__":
    main()
