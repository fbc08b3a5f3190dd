"""Deterministic sampling for training-data mixing.

A 100 TB corpus is never trained on verbatim: sources are re-weighted
(books up, web down) by SAMPLING, and the sample must be deterministic —
re-running the pipeline, or re-computing a lost partition, must keep
exactly the same rows. So no RNG: membership is a pure function of the
row key via the md5-derived ``functions.hash32`` (which also makes every
sample oracle-checkable in DuckDB, unlike Spark's ``TABLESAMPLE``).

Map-only scan stages — the filter pushes no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import hash32

__all__ = [
    "hash_sample",
    "reservoir_sample",
    "stratified_sample",
    "shuffle_shard",
    "token_budget_sample",
    "per_source_cap",
    "temperature_mix",
    "leakproof_split",
    "balanced_sample",
    "weighted_sample",
]

_BUCKETS = 10_000  # rate resolution: 0.01%


def _keep(key: Column, rate: float, seed) -> Column:
    """Deterministic membership: hash the key into 10k buckets, keep the
    first ``rate`` fraction. hash32 is non-negative (8 hex chars), so
    pmod == mod."""
    return F.pmod(hash32(key, seed), F.lit(_BUCKETS)) < F.lit(int(round(rate * _BUCKETS)))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str | int = "sample"
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by key hash.
    Same key + same seed → same verdict on any engine, any run, any
    partitioning; disjoint seeds give independent samples."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_keep(F.col(key_col), rate, seed))


def reservoir_sample(
    df: DataFrame, key_col: str, k: int, seed: str | int = "reservoir"
) -> DataFrame:
    """EXACTLY-k uniform sample without replacement, deterministic: rank
    every row by a seeded key hash and keep the k smallest (hash ties
    break on the key itself, so the selection is total-order stable on
    any engine, any partitioning, any run). The fixed-size complement of
    :func:`hash_sample`'s fixed-RATE membership — "give me exactly 10k
    docs" for eval sets and audits, where a rate drifts with corpus size.

    Scale shape: distributed top-k (TakeOrderedAndProject) — each
    partition keeps its k best, the driver merges P×k candidates; no
    global sort, no single-reducer funnel. Re-running after the corpus
    grows keeps the overlap high (a row's rank key never changes — only
    rows whose hash enters the new top-k swap in), the property that
    makes incremental eval-set refreshes cheap to diff.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    rk = hash32(F.col(key_col), seed)
    return (
        df.withColumn("__rk", rk)
        .orderBy(F.col("__rk").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__rk")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    seed: str | int = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing op: e.g.
    ``rates={"books": 1.0, "web": 0.25}`` keeps all books and a quarter
    of web. Strata not listed keep ``default_rate``. One map-only filter;
    the per-stratum threshold is a CASE over the stratum column, so no
    join against a rates table is needed.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh: Column = F.lit(int(round(default_rate * _BUCKETS)))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == s, F.lit(int(round(r * _BUCKETS)))
        ).otherwise(thresh)
    return df.filter(F.pmod(hash32(F.col(key_col), seed), F.lit(_BUCKETS)) < thresh)


def shuffle_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int = 64,
    seed: str | int = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle + sharding — training-order
    generation. Every row gets a pseudorandom-but-reproducible position:
    ``shard`` = hash bucket of the key, ``pos`` = rank of a second,
    independent hash within the shard. Re-running the pipeline (or
    recomputing a lost partition) reproduces the identical order — the
    property an RNG-based shuffle cannot give — and epoch variation is a
    seed change away.

    100 TB shape: the shard assignment is a map-only hash; the within-
    shard rank is one window per shard key. A GLOBAL row_number would
    funnel the corpus through one reducer; sharding first makes each
    rank window an independent partition-sized task, and the consumer
    (a training loader) reads shards in shard order anyway. Ties on the
    order hash break by key, so the order is total and deterministic.

    Output: input columns + (shard int, pos long).
    """
    from pyspark.sql import Window as W

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col)
    shard = F.pmod(hash32(key, f"{seed}:shard"), F.lit(n_shards)).cast("int")
    order = hash32(key, f"{seed}:order")
    w = W.partitionBy("shard").orderBy(F.col("__ord"), key)
    return (
        df.withColumn("shard", shard)
        .withColumn("__ord", order)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__ord")
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    text_col: str,
    budgets: Mapping[str, int],
    default_budget: int = 0,
    seed: str | int = "budget",
) -> DataFrame:
    """Token-budget mixing: keep documents per stratum, in deterministic
    hash order, until the stratum's token budget is reached — "give me
    ~1M tokens of books and ~250k of web", the unit data-mixing actually
    speaks (rates are a proxy; budgets are the contract).

    A document is kept iff the cumulative token count of the docs BEFORE
    it (in hash order) is still under budget, so the budget may overshoot
    by at most one document — deterministic, engine-portable, and
    independent of partitioning.

    Scale note: the running sum is a per-stratum window — one task per
    stratum. That is the honest cost of an exact sequential budget; with
    few strata (sources) each task streams its stratum. For budget cuts
    over huge single strata, use rate-based ``stratified_sample`` (map-
    only) to get within a few percent first, then this for the exact cut.

    Output: (key, stratum, n_tokens, cum_before) for kept docs.
    """
    from pyspark.sql import Window as W

    from ..functions import token_count

    order = hash32(F.col(key_col), seed)
    w = (
        W.partitionBy(strata_col)
        .orderBy(order, F.col(key_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    budget = F.lit(default_budget)
    for s, b in budgets.items():
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(budget)
    return (
        df.select(
            F.col(key_col),
            F.col(strata_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(F.col("cum_before") < budget)
    )


def per_source_cap(
    df: DataFrame,
    key_col: str,
    source_col: str,
    cap: int,
    order_by: Column | None = None,
) -> DataFrame:
    """Domain/source cap: keep at most ``cap`` documents per source, the
    best first — the anti-monoculture rule every pretraining mix applies
    (a handful of mirror-heavy domains must not dominate the corpus).

    ``order_by`` ranks documents within a source (default: the
    deterministic hash order used everywhere in this module, i.e. a
    uniform cap). Ties always break on the key so the result is total-
    order deterministic and engine-portable.

    100 TB shape: one shuffle on the source key + a per-source top-k
    window. Skewed sources are the norm (that is WHY the cap exists) —
    for a pathological single-source partition the two-phase refinement
    is: map-side per-partition top-``cap`` first (each partition can
    discard all but ``cap`` rows for each source it holds), then the
    exact window over the ≤ cap × partitions survivors. Spark's window
    alone is used here; the map-side pre-cut is the documented escape
    hatch when one source is terabytes.
    """
    from pyspark.sql import Window as W

    if order_by is None:
        order_by = hash32(F.col(key_col), "cap")
    w = W.partitionBy(source_col).orderBy(order_by, F.col(key_col))
    return (
        df.withColumn("rank_in_source", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_source") <= int(cap))
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    total_target: int,
    seed: str | int = "temp",
) -> DataFrame:
    """Temperature-based source mixing at α = 0.5 — the classic
    multilingual/pretraining re-weighting: source s is sampled toward a
    quota ∝ √n_s (big sources down-weighted, small ones boosted) scaled
    so the expected total is ``total_target``. Unlike
    :func:`stratified_sample` the per-source rates are DATA-DEPENDENT
    (computed from the source sizes in the same job), and membership is
    still a pure md5 function of the key — deterministic across runs,
    partitionings, and engines.

    Engine-reproducibility is engineered, not assumed: α is fixed at 0.5
    because ``sqrt`` is correctly rounded under IEEE-754 in every engine
    while general ``pow`` is not; each √n_s is scaled to an INTEGER
    weight (round(√n·10⁶)) so the cross-strata normalizing sum is exact
    integer arithmetic (a float sum would be aggregation-order-
    dependent); the remaining rate arithmetic is a fixed left-associated
    tree of single correctly-rounded double ops, mirrored verbatim in
    the SQL twin.

    Scale shape: one |strata|-sized aggregate, broadcast back; the
    membership filter is map-only. Output: input rows kept, plus the
    stratum's rate_bucket (of 10 000) for auditability.
    """
    counts = df.groupBy(F.col(strata_col)).agg(F.count(F.lit(1)).alias("__n"))
    weights = counts.select(
        F.col(strata_col),
        F.col("__n"),
        F.round(F.sqrt(F.col("__n").cast("double")) * F.lit(1_000_000.0), 0)
        .cast("long")
        .alias("__w"),
    )
    tot = weights.agg(F.sum("__w").alias("__tw"))
    rate = (
        F.lit(float(total_target))
        * F.col("__w").cast("double")
        / F.col("__tw").cast("double")
        / F.col("__n").cast("double")
    )
    buckets = F.least(
        F.lit(_BUCKETS).cast("long"), F.floor(rate * F.lit(float(_BUCKETS)))
    )
    rates = weights.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col), buckets.alias("__rb")
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.pmod(hash32(F.col(key_col), seed), F.lit(_BUCKETS)) < F.col("__rb"))
        .withColumn("rate_bucket", F.col("__rb"))
        .drop("__rb")
    )


def leakproof_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
    max_hamming: int = 3,
) -> DataFrame:
    """LEAKAGE-PROOF train/val/test split: assignment is decided per
    NEAR-DUP CLUSTER, not per document — every member of a SimHash
    cluster (``dedup.dup_clusters`` transitive closure) lands in the same
    split, so no near-duplicate of a test document can sit in train (the
    eval-contamination failure mode a naive per-doc hash split has).

    Deterministic: bucket = md5-hash32('split:' || cluster_rep) mod 100,
    train if < train_pct, val if < train_pct+val_pct, else test — no RNG
    state, stable under re-runs and corpus growth (a cluster keeps its
    split as long as its representative survives).

    Scale shape: inherits the cluster pass (banded SimHash pairs + O(log
    d) component rounds); the assignment itself is one map-side
    expression on the |docs| label relation. Output: (doc_id,
    cluster_rep, cluster_size, split).
    """
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError("percentages must satisfy 0<train, 0<=val, sum<=100")
    from ..functions import hash32
    from .dedup import dup_clusters

    lab = dup_clusters(df, id_col, text_col, max_hamming=max_hamming)
    b = F.pmod(hash32(F.col("cluster_rep"), "split"), F.lit(100))
    return lab.select(
        F.col(id_col),
        "cluster_rep",
        "cluster_size",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def balanced_sample(
    df: DataFrame,
    key_col: str,
    class_col: str,
    seed: str | int = "balance",
) -> DataFrame:
    """CLASS-BALANCED downsample: every class keeps exactly
    min-class-count rows, chosen in deterministic seeded-hash order —
    the label-balancing move before training a classifier on skewed
    data (and the degenerate-free alternative to per-class rates, which
    drift as the distribution shifts).

    Deterministic: per-class rank by (md5 hash, key); the min count is
    one tiny aggregate broadcast back. Re-running reproduces the exact
    sample; a grown majority class changes nothing unless new rows hash
    into the kept prefix.

    Scale shape: one |classes| aggregate + one rank window partitioned
    by class (each class streams through its own task — same shape as
    the percentile cut). Output: input columns, filtered.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("__c"))
    m = counts.agg(F.min("__c").alias("__m"))
    w = W.partitionBy(class_col).orderBy(
        hash32(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("__rn") <= F.col("__m"))
        .drop("__rn", "__m")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str | int = "wsample",
    scale: int = 10**6,
) -> DataFrame:
    """EXACTLY-k WEIGHTED sample without replacement, deterministic —
    the corpus-mixing primitive :func:`reservoir_sample` can't express:
    "pick 10k docs, longer/higher-quality ones proportionally more
    often". Every row gets the integer rank key

        rk = (hash32(seed:key) · scale) DIV max(weight, 1)

    and the k smallest keys win (ties on the key column — total-order
    stable). Doubling a row's weight halves its rank key, doubling its
    odds of sitting under any selection threshold — the integer-closed
    analogue of Efraimidis-Spirtes A-ES ordering (whose u^(1/w) float
    power cannot certify); hash32 makes the draw replayable on any
    engine with no RNG state. Non-positive/NULL weights clamp to 1 (a
    row is never unsampleable). Weights must be integers (quantize
    floats first — e.g. floor(quality·1e6)).

    Scale shape: map-only key computation + distributed top-k
    (TakeOrderedAndProject) — per-partition heads, driver merge of P×k;
    stable under corpus growth exactly like reservoir_sample (keys never
    change; only genuinely-better rows swap in).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.greatest(F.coalesce(F.col(weight_col).cast("long"), F.lit(1)), F.lit(1))
    return (
        df.withColumn("__w", w)
        .withColumn("__h", hash32(F.col(key_col), seed) * F.lit(int(scale)))
        .withColumn("__rk", F.expr("__h div __w"))
        .orderBy(F.col("__rk").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__w", "__h", "__rk")
    )
