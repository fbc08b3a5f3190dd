"""Interleaved checkout A/B (r11, judge ask #4): attribute a bench move
to CODE vs HOST by running the same queries from two checkouts in
ALTERNATING fresh sessions on the same host, min-of-N per side.

A loaded or drifting host inflates BOTH sides equally (the sessions
interleave in time), so a code regression shows as a one-sided gap
while host drift shows as both sides moving together vs their recorded
round numbers — exactly the r10 judge protocol, now a reusable script.

Usage:
  python scripts/ab_probe.py --a /path/to/checkoutA --b /path/to/checkoutB \
      [--reps 3] [--sf /root/testdata/sf0.1] [--queries q1,q2,...]

Each rep spawns one fresh subprocess per checkout (A then B), which
imports that checkout's __spark_entry__, warms the session, and times
each query once (collect()). store_put is special-cased: it times the
reference-shape put phase (create + hash index + full lineitem insert)
like bench.py's timed_put. Prints a markdown table of min-of-N and the
per-rep times.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RUNNER = r'''
import json, os, sys, tempfile, time
root = sys.argv[1]
sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
sys.path.insert(0, root)
os.chdir(root)
from shortcut_spark.session import get_spark
spark = get_spark("ab-probe")
from pyspark.sql import functions as F
import __spark_entry__ as E
spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warm-up
qs = E.queries()
out = {}
for name in names:
    if name == "store_put":
        from shortcut_spark.store import Store
        li = os.path.join(sf_dir, "lineitem.parquet")
        t0 = time.perf_counter()
        st = Store.create(spark, tempfile.mkdtemp(prefix="ab_put_") + "/s",
                          spark.read.parquet(li).schema)
        st.index("l_orderkey", "hash")
        st.insert(spark.read.parquet(li))
        out[name] = round(time.perf_counter() - t0, 3)
        continue
    fn = qs[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    out[name] = round(time.perf_counter() - t0, 3)
print("ABRESULT " + json.dumps(out))
'''


def run_side(root: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, root, sf_dir, ",".join(names)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"runner in {root} produced no result:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (e.g. prior round)")
    ap.add_argument("--b", required=True, help="checkout B (e.g. head)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    args = ap.parse_args()
    names = args.queries.split(",")
    times: dict[str, dict[str, list[float]]] = {
        "a": {n: [] for n in names}, "b": {n: [] for n in names}
    }
    for rep in range(args.reps):
        for side, root in (("a", args.a), ("b", args.b)):
            res = run_side(root, args.sf, names)
            for n, dt in res.items():
                times[side][n].append(dt)
            print(f"rep {rep + 1} side {side}: {res}", flush=True)
    print("\n| query | A min (s) | B min (s) | B/A | A runs | B runs |")
    print("|---|---|---|---|---|---|")
    table = {}
    for n in names:
        a, b = min(times["a"][n]), min(times["b"][n])
        table[n] = {"a_min": a, "b_min": b, "ratio": round(b / a, 3),
                    "a_runs": times["a"][n], "b_runs": times["b"][n]}
        print(f"| {n} | {a:.2f} | {b:.2f} | {b / a:.3f} | "
              f"{times['a'][n]} | {times['b'][n]} |")
    print("\nABTABLE " + json.dumps(table))


if __name__ == "__main__":
    main()
