"""Stage isolation for the SimHash near-dup cluster family (guide §1.4):
time fingerprint build, banded pair generation (pre/post verify), and the
CC loop separately with the noop sink. Usage: python scripts/cc_probe.py [runs]
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
    from pyspark.sql import functions as F

    from shortcut_spark.operators import dedup
    from shortcut_spark.operators.dedup import _fp_hamming_pairs, simhash
    from shortcut_spark.operators.graph import connected_components

    spark = get_spark("cc-probe")
    sc = spark.sparkContext
    spark.range(1_000_000).select(F.sum("id")).collect()

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    docs = entry_mod._t(spark, SF_DIR, "documents")

    def step(name, fn, r):
        group = f"ccp_{r}_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        nj = len(sc.statusTracker().getJobIdsForGroup(group))
        print(f"  {name:34s} {dt:7.3f}s jobs={nj}", flush=True)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for r in range(runs):
        print(f"--- run {r} ---", flush=True)
        step("simhash (noop)", lambda: noop(simhash(docs, "doc_id", "text")), r)
        fp = simhash(docs, "doc_id", "text").localCheckpoint(eager=True)
        n_fp = fp.count()
        fpg = fp.groupBy("simhash").agg(F.min("doc_id").alias("__rep"))
        reps = fpg.select(F.col("__rep").alias("doc_id"), "simhash").localCheckpoint(eager=True)
        n_reps = reps.count()
        print(f"  fingerprints={n_fp} distinct-reps={n_reps}", flush=True)

        # candidates BEFORE distinct (the banded join output)
        import itertools

        W, blocks, max_h = 32, 4, 3
        from shortcut_spark.operators.similarity import _corpus_count

        if _corpus_count(reps) > 1_000_000:
            blocks = 8
        w = W // blocks
        agree = blocks - max_h
        combos = list(itertools.combinations(range(blocks), agree))
        block_val = [
            F.shiftright(F.col("simhash"), i * w).bitwiseAND(F.lit((1 << w) - 1))
            for i in range(blocks)
        ]

        def pack(ci, comb):
            key = F.lit(ci).cast("long")
            for i in comb:
                key = F.shiftleft(key, w) + block_val[i]
            return key

        keys = [pack(ci, comb) for ci, comb in enumerate(combos)]
        bands = reps.select(
            F.col("doc_id"), F.col("simhash"), F.explode(F.array(*keys)).alias("sig")
        )
        a, b = bands.alias("a"), bands.alias("b")
        raw = (
            a.join(b, ["sig"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )
        )
        n_raw = step("banded join rows (count)", lambda: raw.count(), r)
        print(f"    raw candidate rows = {n_raw}", flush=True)
        n_dis = step("distinct pairs (count)", lambda: raw.distinct().count(), r)
        print(f"    distinct candidate pairs = {n_dis}", flush=True)
        step(
            "pairs as shipped (noop)",
            lambda: noop(_fp_hamming_pairs(reps, "doc_id", max_h)),
            r,
        )
        pairs_ck = (
            _fp_hamming_pairs(reps, "doc_id", max_h)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_pairs = pairs_ck.count()
        print(f"    verified pairs = {n_pairs}", flush=True)
        step(
            "CC loop over verified pairs",
            lambda: noop(connected_components(pairs_ck, "id_a", "id_b")),
            r,
        )
        step(
            "dup_clusters end-to-end (noop)",
            lambda: noop(dedup.dup_clusters(docs, "doc_id", "text")),
            r,
        )


if __name__ == "__main__":
    main()
