"""r13 scale probes (VERDICT r12 ask #7): the claims that survive 100 TB,
measured at 100x, with JOBS + WALL per probe (single pass, no min-of-N).

1. Banded hamming-pair candidate economy (`dedup._fp_hamming_pairs`):
   the 4-block/8-block crossover at 100x the documents fixture (500k
   fingerprints) and past the auto-sizing crossover (2M) — candidates,
   wall and job count for both block sizes, plus what blocks=None picks.
2. Dup-cluster edge materialization (`dedup.dup_clusters`): the
   simhash-band edge build + CC closure end-to-end at 10x and 100x with
   planted duplicate families (1% of docs are 3-way near-dups), the
   residual wall the r12 round named.

Writes nothing outside /tmp. Usage:
    python scripts/scale_probe_r13.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shortcut_spark.operators import dedup  # noqa: E402
from shortcut_spark.session import get_spark  # noqa: E402


def synth_fp(spark, n: int):
    """n deterministic ~uniform 32-bit fingerprints (md5 of the id),
    PARQUET-BACKED: a checkpointed/in-memory relation reports unknown or
    tiny stats and the banded self-join then plans a broadcast that
    explodes at band fan-out (measured: 8.4 GiB attempted broadcast at
    n=2M, blocks=8) — file-backed inputs carry honest, size-growing
    stats, which is the production shape."""
    import tempfile

    d = tempfile.mkdtemp(prefix="sp13_fp_") + "/fp.parquet"
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("simhash"),
    ).write.parquet(d)
    return spark.read.parquet(d)


def synth_docs(spark, n: int):
    """n docs of 20 unique tokens; 3%% of docs form 3-way families of
    near-identical texts (one token tweaked) — planted near-dup pairs so
    the verify stage and CC do real work. Parquet-backed (see synth_fp)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - (F.col("id") % 3)).alias("fam"),
        (F.col("id") % 100 < 3).alias("dup"),
    )
    uniq = F.concat_ws(
        " ",
        *[
            F.substring(F.md5(F.concat_ws("-", F.col("seed"), F.lit(j))), 1, 8)
            for j in range(20)
        ],
    )
    return base.select(
        "doc_id",
        F.when(F.col("dup"), F.col("fam")).otherwise(F.col("doc_id")).alias("seed"),
        # family members differ in ONE trailing token -> hamming-near
        F.when(F.col("dup"), (F.col("doc_id") % 3).cast("string")).otherwise(
            F.lit("")
        ).alias("tweak"),
    ).select(
        "doc_id",
        F.concat(uniq, F.lit(" t"), F.col("tweak")).alias("text"),
    )


def probe(spark, name, fn):
    sc = spark.sparkContext
    group = f"sp13_{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    print(f"| {name} | {dt:.1f} s | {jobs} jobs | {out} |", flush=True)
    return dt, jobs, out


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("scale-probe-r13")
    spark.range(1_000_000).select(F.sum("id")).collect()

    print("\n### banded hamming-pair crossover (uniform fingerprints)\n")
    print("| probe | wall | jobs | result |\n|---|---|---|---|")
    sizes = [500_000] if quick else [500_000, 2_000_000]
    for n in sizes:
        fp = synth_fp(spark, n)
        for blocks in (4, 8):
            probe(
                spark,
                f"fp_pairs n={n} blocks={blocks}",
                lambda fp=fp, blocks=blocks: dedup._fp_hamming_pairs(
                    fp, "doc_id", max_hamming=3, blocks=blocks
                ).count(),
            )
        # what the auto-sizing picks at this n (memoized corpus count)
        from shortcut_spark.operators.similarity import _corpus_count

        c = _corpus_count(fp)
        picked = 8 if c > 1_000_000 else 4
        print(f"| auto-sizing at n={n} | - | - | picks blocks={picked} |")

    print("\n### dup_clusters edge materialization + CC\n")
    print("| probe | wall | jobs | result |\n|---|---|---|---|")
    for n in [50_000] + ([] if quick else [500_000]):
        import tempfile

        d = tempfile.mkdtemp(prefix="sp13_docs_") + "/docs.parquet"
        synth_docs(spark, n).write.parquet(d)
        docs = spark.read.parquet(d)
        probe(
            spark,
            f"dup_clusters n={n}",
            lambda docs=docs: dedup.dup_clusters(docs, "doc_id", "text").count(),
        )


if __name__ == "__main__":
    main()
