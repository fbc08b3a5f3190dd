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

__all__ = ["approx_distinct", "approx_quantiles", "heavy_hitters"]


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
