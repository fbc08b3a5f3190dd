"""Per-step job/wall breakdown of the store_matview script (guide §1):
which of the 17 jobs belong to which step, so optimization targets the
actual floor. Usage: python scripts/mv_probe.py [--runs 2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from shortcut_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import tempfile as _tf

    from pyspark.sql import functions as F

    from shortcut_spark.cmp import eq
    from shortcut_spark.matview import MatView

    spark = get_spark("mv-probe")
    sc = spark.sparkContext
    spark.range(1_000_000).select(F.sum("id")).collect()

    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    for r in range(runs):
        print(f"--- run {r} ---", flush=True)
        steps: list[tuple[str, float, int]] = []

        def step(name, fn):
            group = f"mvp_{r}_{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            nj = len(sc.statusTracker().getJobIdsForGroup(group))
            steps.append((name, dt, nj))
            print(f"  {name:28s} {dt:7.3f}s jobs={nj}", flush=True)
            return out

        st = step("fresh_store(orders)", lambda: entry_mod._fresh_store(spark, SF_DIR, "orders"))
        mv = step(
            "MatView.create",
            lambda: MatView.create(
                spark,
                os.path.join(_tf.mkdtemp(prefix="scmv_"), "v"),
                st,
                ["o_orderstatus"],
                [
                    ("n", "count", None),
                    ("sum_price", "sum", "o_totalprice"),
                    ("avg_price", "avg", "o_totalprice"),
                ],
            ),
        )
        step("delete(status=P)", lambda: st.delete([eq("o_orderstatus", "P")]))
        step("refresh#1", lambda: mv.refresh())
        print(f"    refresh#1 jobs={mv.last_refresh_jobs}", flush=True)
        step(
            "insert(keys<100,micro)",
            lambda: st.insert(
                entry_mod._t(spark, SF_DIR, "orders").filter(F.col("o_orderkey") < 100),
                micro_batch=True,
            ),
        )
        step("refresh#2", lambda: mv.refresh())
        print(f"    refresh#2 jobs={mv.last_refresh_jobs}", flush=True)
        step(
            "read+noop",
            lambda: mv.read().write.format("noop").mode("overwrite").save(),
        )
        total = sum(d for _, d, _ in steps)
        jobs = sum(j for _, _, j in steps)
        print(f"  TOTAL {total:.3f}s jobs={jobs}", flush=True)


if __name__ == "__main__":
    main()
