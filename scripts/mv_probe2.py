"""Sub-phase timing inside MatView.refresh (driver-side planning vs
execution): monkeypatch timers around changes(), the combine build, and
the state merge. Usage: python scripts/mv_probe2.py [runs]
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

    from shortcut_spark import matview as mv_mod
    from shortcut_spark import store as store_mod
    from shortcut_spark.cmp import eq
    from shortcut_spark.matview import MatView

    spark = get_spark("mv-probe2")
    spark.range(1_000_000).select(F.sum("id")).collect()

    # -- timers --------------------------------------------------------
    import functools

    def timed(cls, name):
        orig = getattr(cls, name)

        @functools.wraps(orig)
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            print(f"      {cls.__name__}.{name:30s} {time.perf_counter()-t0:7.3f}s", flush=True)
            return out

        setattr(cls, name, wrap)

    timed(store_mod.Store, "changes")
    timed(store_mod.Store, "merge")
    timed(store_mod.Store, "_enforce_constraints")
    timed(mv_mod.MatView, "_combine_self_maintainable")
    timed(mv_mod.MatView, "_to_state_rows")
    timed(mv_mod.MatView, "_estimate_delta_rows")

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(runs):
        print(f"--- run {r} ---", flush=True)
        st = entry_mod._fresh_store(spark, SF_DIR, "orders")
        mv = MatView.create(
            spark,
            os.path.join(_tf.mkdtemp(prefix="scmv_"), "v"),
            st,
            ["o_orderstatus"],
            [
                ("n", "count", None),
                ("sum_price", "sum", "o_totalprice"),
                ("avg_price", "avg", "o_totalprice"),
            ],
        )
        st.delete([eq("o_orderstatus", "P")])
        t0 = time.perf_counter()
        print("    refresh#1:", flush=True)
        mv.refresh()
        print(f"    refresh#1 total {time.perf_counter()-t0:.3f}s jobs={mv.last_refresh_jobs}", flush=True)
        st.insert(
            entry_mod._t(spark, SF_DIR, "orders").filter(F.col("o_orderkey") < 100),
            micro_batch=True,
        )
        t0 = time.perf_counter()
        print("    refresh#2:", flush=True)
        mv.refresh()
        print(f"    refresh#2 total {time.perf_counter()-t0:.3f}s jobs={mv.last_refresh_jobs}", flush=True)


if __name__ == "__main__":
    main()
