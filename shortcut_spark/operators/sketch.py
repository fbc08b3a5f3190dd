"""Approximate/sketch aggregates — the 100 TB interactive-analytics tier.

At full scale, exact COUNT(DISTINCT) and exact percentiles are the two
aggregations whose memory is unbounded in NDV/row-count; the sketch tier
trades bounded error for fixed memory:

- ``approx_distinct``: HyperLogLog++ (Spark's ``approx_count_distinct``)
  — fixed ~kilobytes of state per group at any cardinality, mergeable in
  map-side partials, relative error ``rsd`` (default 5%).
- ``approx_quantiles``: Greenwald-Khanna (Spark's ``percentile_approx``)
  — bounded-size rank summary, mergeable, rank error ≤ 1/accuracy.
- ``heavy_hitters``: EXACT frequency heavy hitters (count > support × N)
  via one groupBy — exact because the output is bounded by 1/support
  regardless of input size, so no sketch is needed; this one is
  oracle-checkable bit-for-bit.

The reference engine has no aggregate surface at all (client-side
``Iterator::count()`` only, ``src/lib.rs:255``); this family is part of
the scale extension tier. The approximate ops are certified by
property tests against their exact twins (error-bound assertions), not by
the value-hash oracle — approximation is engine-specific by design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "heavy_hitters",
    "cms_build",
    "cms_estimate",
    "exact_quantiles",
]


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative sd ``rsd``)
    next to the group's row count. Output: (*keys, n_rows, approx_distinct)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna, rank error ≤
    1/accuracy). Output: (*keys, q_<p> per requested prob)."""
    aggs = [
        F.percentile_approx(col, p, accuracy).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def heavy_hitters(
    df: DataFrame, col: str, support: float = 0.001
) -> DataFrame:
    """EXACT heavy hitters: values of ``col`` occurring in more than
    ``support`` fraction of rows, with their counts. One shuffle on the
    value; the scalar total rides along as a broadcast 1-row cross join.
    Output size is bounded by 1/support however large the input —
    the reason this stays exact at 100 TB."""
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("__total") * support)
        .select(
            "value",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 8).alias("frac"),
        )
    )


def cms_build(df: DataFrame, col: str, width: int = 1024, depth: int = 4) -> DataFrame:
    """Count-Min Sketch build: a depth × width counter table over the
    frequencies of ``col``. Cell for hash row i is
    ``hash32("cms<i>", value) % width`` — md5-derived (functions.hash32),
    so the whole sketch is DETERMINISTIC and engine-reproducible, unlike
    HLL/GK: the oracle can rebuild it cell-for-cell in SQL, which makes
    this the hash-certifiable member of the sketch tier.

    Scale shape: one map-side explode to ``depth`` (row, cell) pairs per
    input row, then ONE partial-aggregated shuffle whose key space is at
    most depth × width cells — fixed memory and fixed shuffle width at
    any input size, and two sketches merge by cell-wise sum (the
    classical CMS properties). Output: (row, cell, cnt).
    """
    from ..functions import hash32

    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    (hash32(F.col(col), seed=f"cms{i}") % width).alias("cell"),
                )
                for i in range(depth)
            ]
        )
    ).alias("rc")
    return (
        df.filter(F.col(col).isNotNull())
        .select(cells)
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Point-frequency estimates from a CMS: est(x) = min over hash rows
    of the counter at x's cell — deterministically an UPPER bound of the
    true count, within +εN (ε ≈ e/width) with high probability. The
    sketch table is at most depth × width rows → broadcast to the probe
    side; cells never touched by any value coalesce to 0. Output:
    (<col>, cms_est)."""
    from ..functions import hash32

    probe_cells = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (hash32(F.col(col), seed=f"cms{i}") % width).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(F.col(col), F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probe_cells.join(F.broadcast(cms), ["row", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Scalable EXACT type-1 quantiles (lower order statistic) for
    discrete / bounded-domain columns — the scale path Spark's exact
    ``percentile`` lacks: that aggregate buffers EVERY group value in one
    aggregation buffer (O(rows-per-group) executor memory), while this
    derives order statistics from (group, value) COUNTS, so shuffle and
    window sizes are bounded by the number of DISTINCT values per group,
    never rows. The honest constraint: for continuous high-cardinality
    doubles the count table degenerates toward row count — use the GK
    tier (:func:`approx_quantiles`) there.

    Definition (replicated verbatim by the oracle): target rank
    r_q = ceil(q·n) in double arithmetic (engine-identical IEEE ops);
    the answer is the smallest value whose cumulative count ≥ r_q.
    Counts are integers → the whole report is hash-exact.

    Output: (group, q, value, n_rows), one row per group × quantile.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    w = W.partitionBy(group_col).orderBy(value_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(w)).join(totals, group_col)
    q_lits = F.array(*[F.lit(float(q)) for q in qs])
    exploded = cum.select(
        group_col,
        value_col,
        "__cum",
        "__n",
        F.explode(q_lits).alias("q"),
    )
    hit = exploded.filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__n"))
    )
    return hit.groupBy(group_col, "q").agg(
        F.min(value_col).alias("value"),
        F.max("__n").cast("long").alias("n_rows"),
    )
