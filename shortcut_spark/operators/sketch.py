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
    "equidepth_histogram",
    "key_skew_profile",
    "corr_matrix",
    "quantile_normalize",
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


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Key-distribution SKEW profile — the diagnostic you run BEFORE
    picking a join/agg strategy at scale: the top-k heaviest keys with
    their corpus share, plus exact global concentration stats (distinct
    keys, total rows, Gini coefficient). A top-1 share of 0.3 says
    "salt this key"; a Gini near 0 says the plain hash shuffle is fine.

    Everything is EXACT and engine-portable: shares divide exact integer
    counts; the Gini uses Σ i·cᵢ over counts sorted ascending, computed
    from the COUNT-OF-COUNTS relation — ties contribute c·Σi regardless
    of intra-tie order, so the statistic needs no per-key global sort:

        gini = (2·S − (n+1)·T) / (n·T),  S = Σ i·cᵢ,  T = Σ cᵢ

    Scale shape: one key-count shuffle (map-side combine), then the
    count-of-counts rollup — the only unpartitioned window runs on
    |distinct count values| rows (the same honest degeneration bound as
    ``exact_quantiles``), and the top-k is a distributed
    TakeOrderedAndProject, never a global sort.

    Output: top_k rows (rank, key, cnt, share, cum_share, n_keys,
    n_rows, gini) — the aggregate stats repeat on every row.
    """
    from pyspark.sql import Window as W

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    dec38 = "decimal(38,0)"
    cnt = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cnt = cnt.localCheckpoint(eager=False)  # reused: top-k + count-of-counts
    cc = cnt.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w = W.orderBy("cnt").rowsBetween(W.unboundedPreceding, -1)
    cc2 = cc.withColumn(
        "s0", F.lit(1) + F.coalesce(F.sum("m").over(w), F.lit(0))
    )
    # block of m keys with count c starting at sorted index s0 contributes
    # c * (2*m*s0 + m*(m-1)) to 2S (doubled so the arithmetic stays
    # division-free — decimal division would introduce scale/rounding)
    m_d = F.col("m").cast(dec38)
    blk2 = F.col("cnt").cast(dec38) * (
        F.lit(2).cast(dec38) * m_d * F.col("s0")
        + m_d * (F.col("m") - F.lit(1))
    )
    stats = cc2.agg(
        F.sum(blk2).cast(dec38).alias("__S2"),
        F.sum(F.col("m").cast(dec38)).cast(dec38).alias("__n"),
        F.sum(F.col("cnt").cast(dec38) * F.col("m")).cast(dec38).alias("__T"),
    ).select(
        F.col("__n").cast("long").alias("n_keys"),
        F.col("__T").cast("long").alias("n_rows"),
        (
            (F.col("__S2") - (F.col("__n") + F.lit(1)) * F.col("__T")).cast("double")
            / (F.col("__n") * F.col("__T")).cast("double")
        ).alias("gini"),
    )
    top = cnt.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_k)
    wr = W.orderBy(F.col("cnt").desc(), F.col("key").asc())  # k rows only
    top = (
        top.withColumn("rank", F.row_number().over(wr).cast("long"))
        .withColumn(
            "__cum",
            F.sum("cnt").over(wr.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rank",
        "key",
        "cnt",
        (F.col("cnt").cast("double") / F.col("n_rows").cast("double")).alias(
            "share"
        ),
        (F.col("__cum").cast("double") / F.col("n_rows").cast("double")).alias(
            "cum_share"
        ),
        "n_keys",
        "n_rows",
        "gini",
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    buckets: int = 8,
) -> DataFrame:
    """EQUI-DEPTH (equal-frequency) histogram per group — the optimizer
    statistic behind selectivity estimation and the boundary table a
    skew-aware range partitioner wants. Derived from (group, value)
    COUNTS exactly like :func:`exact_quantiles`: shuffle and window
    sizes are bounded by DISTINCT values per group, never rows (same
    honest degeneration bound for continuous high-cardinality doubles).

    Each distinct value lands in ONE bucket by its lower cumulative
    rank: bucket = (cum_before · B) DIV n — integral arithmetic
    end-to-end (no clamp needed: cum_before ≤ n−1 ⇒ bucket ≤ B−1), so
    the whole report is hash-exact. A value heavier than a bucket's
    depth makes buckets uneven — a value never splits across buckets,
    which is precisely what a range partitioner needs to know (that
    value must be salted, not split).

    Output: (group, bucket, lo, hi, n_rows) — lo/hi the bucket's value
    bounds, n_rows its exact depth.
    """
    from pyspark.sql import Window as W

    b = int(buckets)
    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    w = W.partitionBy(group_col).orderBy(value_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(w)).join(totals, group_col)
    bucketed = cum.withColumn(
        "bucket", F.expr(f"CAST(((__cum - __c) * {b}) DIV __n AS BIGINT)")
    )
    return bucketed.groupBy(group_col, "bucket").agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.sum("__c").cast("long").alias("n_rows"),
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    quant: int = 10**6,
) -> DataFrame:
    """Exact Pearson correlation matrix over ``cols`` — the profiling
    pass behind feature selection and redundant-column detection, made
    HASH-EXACT the house way: elements quantize to integers
    (floor(x·quant + 0.5)), every sufficient statistic (Σx, Σx², Σxy, n)
    accumulates in DECIMAL(38,0) where addition is associative-exact, and
    the final correlation is ONE fixed double expression over those exact
    integers — float reduce-order can't drift what was never a float sum.

        corr(x,y) = (n·Σxy − Σx·Σy)
                  / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))

    (The quant scale cancels exactly between numerator and denominator.)
    Rows where either column is NULL are dropped PER PAIR (pairwise
    deletion, the SQL corr() convention).

    Scale shape: one aggregate pass computes all C(k,2)+k statistics
    map-side partial-aggregated — no shuffle wider than the single
    1-row result; the matrix is assembled driver-free by unpivoting a
    literal pair list. Overflow: DECIMAL(38,0) holds Σxy up to ~1e38 —
    at quant=1e6 that is ~1e22 rows of unit-scale values; lower quant
    for wide-range columns. Degenerate (zero-variance) columns yield
    NULL correlations, both engines alike.

    Output: (col_x, col_y, n, corr) for x < y in the given order.
    """
    if len(cols) < 2:
        raise ValueError("need >= 2 columns")
    from ..functions import ensure_parallelism

    # the DECIMAL(38,0) multiply-accumulate is the measured wall (the
    # BigDecimal path, see functions.dsum's cost note) and it runs at
    # SCAN parallelism — the fixture arrives as 1-3 partitions, leaving
    # 29+ cores idle for a pure map-side aggregate; spread first (no-op
    # at real scale), project to just the correlated columns so the
    # spread never moves unused bytes
    df = ensure_parallelism(df.select(*cols))
    dec38 = "decimal(38,0)"
    q = {c: F.floor(F.col(c).cast("double") * quant + F.lit(0.5)).cast("long") for c in cols}
    pairs = [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    aggs = []
    for cx, cy in pairs:
        both = F.col(cx).isNotNull() & F.col(cy).isNotNull()
        qx = F.when(both, q[cx]).otherwise(F.lit(None))
        qy = F.when(both, q[cy]).otherwise(F.lit(None))
        tag = f"{cx}__{cy}"
        aggs += [
            F.count(qx).cast("long").alias(f"n__{tag}"),
            F.sum(qx.cast(dec38)).alias(f"sx__{tag}"),
            F.sum(qy.cast(dec38)).alias(f"sy__{tag}"),
            F.sum(qx.cast(dec38) * qx).alias(f"sxx__{tag}"),
            F.sum(qy.cast(dec38) * qy).alias(f"syy__{tag}"),
            F.sum(qx.cast(dec38) * qy).alias(f"sxy__{tag}"),
        ]
    stats = df.agg(*aggs)
    rows = []
    for cx, cy in pairs:
        tag = f"{cx}__{cy}"
        n = F.col(f"n__{tag}").cast(dec38)
        num = (n * F.col(f"sxy__{tag}") - F.col(f"sx__{tag}") * F.col(f"sy__{tag}")).cast("double")
        vx = (n * F.col(f"sxx__{tag}") - F.col(f"sx__{tag}") * F.col(f"sx__{tag}")).cast("double")
        vy = (n * F.col(f"syy__{tag}") - F.col(f"sy__{tag}") * F.col(f"sy__{tag}")).cast("double")
        corr = F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).otherwise(F.lit(None).cast("double"))
        rows.append(
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                F.col(f"n__{tag}").alias("n"),
                corr.alias("corr"),
            )
        )
    return stats.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_x", "r.col_y", "r.n", "r.corr"
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Cross-group QUANTILE NORMALIZATION: each row's within-group rank
    maps to the pooled distribution's value at the same percentile — the
    calibration pass that makes per-source scores comparable when every
    source grades on its own curve (source A's 0.6 may be its top decile
    while source B's 0.6 is its median; after normalization both land at
    the pooled top-decile / median value).

    Exact integer spec (the oracle replicates it):

        r        = row_number within group, ordered by (value, id)
        target_r = ceil(r·N / n_g)  =  (r·N + n_g − 1) DIV n_g
        vnorm    = the pooled value serving rank target_r, i.e. the
                   distinct value whose cumulative count interval
                   [cum − c + 1, cum] contains it.

    Scale shape: one group-keyed rank window over the rows; the pooled
    distribution is a (value → count) relation BOUNDED BY DISTINCT
    VALUES — quantized score domains keep it broadcast-sized (quantize
    first for continuous inputs). Its cumulative count is the house
    DISTRIBUTED two-phase prefix sum (the ``vocab_growth`` pattern):
    distinct values are range-bucketed on their (min, max) span,
    per-bucket totals (≤ ``buckets`` rows) take the only unpartitioned
    window, and each value adds its within-bucket prefix — so no task
    ever sees more than one bucket of the distribution, even when a
    fine quantization makes it large. The final lookup is a broadcast
    interval join: rows never shuffle for it.

    Output: (id, group, value, vnorm).
    """
    from pyspark.sql import Window as W

    buckets = 32
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
    )
    ranked = base.withColumn(
        "__r",
        F.row_number().over(W.partitionBy("__g").orderBy("__v", "__id")).cast("long"),
    )
    sizes = base.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("__ng"))
    n1 = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    tgt = (
        ranked.join(F.broadcast(sizes), "__g")
        .crossJoin(F.broadcast(n1))
        .withColumn("__t", F.expr("(__r * __N + __ng - 1) div __ng"))
    )
    # pooled distribution: bounded by distinct values; its cumulative
    # count is a bucketed two-phase prefix sum, never a global window
    counts = base.groupBy(F.col("__v").alias("__dv")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    span = counts.agg(
        F.min("__dv").alias("__lo"),
        (F.max("__dv") - F.min("__dv")).alias("__span"),
    )
    bucketed = counts.crossJoin(F.broadcast(span)).withColumn(
        "__bkt",
        # NULL sorts FIRST in the rank window (Spark ascending default),
        # so a NULL distinct value must land BEFORE every real bucket —
        # bucket -1, not the least(NULL, …)=last-bucket accident that
        # would misorder the pooled distribution
        F.when(F.col("__dv").isNull(), F.lit(-1))
        .when(F.col("__span") <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("__dv") - F.col("__lo"))
                    * F.lit(int(buckets))
                    / F.col("__span")
                ),
                F.lit(int(buckets) - 1),
            )
        )
        .cast("int"),
    )
    # ≤ `buckets` rows: the only unpartitioned window runs on a tiny table
    w_b = W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.sum("__c").alias("__bsum"))
        .withColumn("__off", F.coalesce(F.sum("__bsum").over(w_b), F.lit(0)))
        .select("__bkt", "__off")
    )
    w_in = W.partitionBy("__bkt").orderBy("__dv").rowsBetween(
        W.unboundedPreceding, 0
    )
    dist = (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.col("__off") + F.sum("__c").over(w_in))
        .select("__dv", "__c", "__cum")
    )
    return (
        tgt.join(
            F.broadcast(dist),
            (F.col("__t") >= F.col("__cum") - F.col("__c") + 1)
            & (F.col("__t") <= F.col("__cum")),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            F.col("__dv").alias("vnorm"),
        )
    )
