"""Integer fixed-point k-means — hash-exact embedding clustering.

Float k-means (``similarity.ivf_fit``) is the right tool for building ANN
indexes, but its reduce-order drift makes the ASSIGNMENTS uncertifiable:
two engines summing doubles in different orders can flip an argmin near a
Voronoi boundary. This module is the certifiable sibling: every arithmetic
step is BIGINT multiply / add / floor-divide over 1e-6-quantized elements
(the convention of ``similarity.embedding_dispersion``), so a fixed number
of Lloyd iterations is bit-identical in any engine and the whole iterative
computation unrolls into a plain CTE chain a SQL oracle can replicate —
the same certification trick as ``graph.pagerank``.

The reference engine has no clustering surface (its world is single-Store
predicate scans, ``/root/reference/src/lib.rs``); this is part of the
LLM-pipeline extension surface: deterministic corpus partitioning for
diversity-aware sampling, per-cluster dedup sharding, and balanced
train/eval splits all need a clustering whose output is reproducible
across engine versions and cluster sizes.

Spec (the oracle replicates it verbatim):

* quantize:   ``q_id = floor(x_id · quant + 0.5)`` per element (exact
  double arithmetic — embeddings arrive as float32, widened identically
  everywhere).
* seed:       centroids c_0..c_{k-1} are the quantized vectors of the k
  smallest ids (rank in id order = cluster id). Deterministic, no RNG.
* assign:     ``cluster(v) = argmin_j Σ_d (q_vd − c_jd)²`` with ties
  broken on the smaller j — integer distances make the argmin exact.
* update:     ``c_jd = fdiv(Σ_{v∈j} q_vd, n_j)`` where ``fdiv`` is
  mathematical FLOOR division expressed sign-safely as
  ``(s − ((s % n) + n) % n) / n`` — Spark's ``div`` truncates toward
  zero while some engines floor, so the operator never relies on either:
  the adjusted numerator is exactly divisible. Empty clusters drop out
  (both engines: the update aggregates only assigned members); surviving
  clusters KEEP their original id, so assignments stay comparable across
  iterations.
* repeat ``iters`` times, then emit the final assignment.

Scale shape: centroids are k·D integers — driver-resident metadata (the
same bounded-collect class as ``ivf_fit``'s seeds). Each iteration is ONE
map-only assignment pass (all k distances evaluate row-locally against
literal centroid arrays — no crossJoin, no per-row shuffle) plus ONE
partial-aggregated (cluster, dim) shuffle whose key space is k·D
regardless of corpus size. Overflow: |x| ≤ ~30 keeps Σ_d diff² inside
int64 at quant=1e6, D=64; lower ``quant`` for wilder ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["kmeans_exact", "pca_top_component", "kmeans_silhouette"]


def _quant_expr(vec_col: str, quant: int) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("long"),
    )


def _dist2(qv: F.Column, centroid: list[int]) -> F.Column:
    c = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qv, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_exact(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    quant: int = 10**6,
) -> DataFrame:
    """(id, cluster, dist2) after ``iters`` exact Lloyd iterations.

    ``cluster`` is the 0-based rank (in id order) of the seed vector whose
    Voronoi cell the row landed in after the final update; ``dist2`` is
    the integer squared distance to that centroid in quantized units.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = emb.select(
        F.col(id_col).alias("__id"), _quant_expr(vec_col, quant).alias("__qv")
    ).localCheckpoint(eager=True)  # scanned once per iteration

    # seeds: quantized vectors of the k smallest ids (bounded: k rows)
    cents: list[tuple[int, list[int]]] = [
        (j, list(r["__qv"]))
        for j, r in enumerate(q.orderBy("__id").limit(k).collect())
    ]

    def assign(cur: list[tuple[int, list[int]]]) -> DataFrame:
        # all |cur| distances evaluate row-locally against literal arrays;
        # argmin = array_min over (dist, cid) structs — map-only, no shuffle
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _dist2(F.col("__qv"), c).alias("d"),
                        F.lit(int(cid)).alias("c"),
                    )
                    for cid, c in cur
                ]
            )
        )
        return q.select("__id", "__qv", best.alias("__best"))

    for _ in range(iters):
        # update: one (cluster, dim) shuffle, key space k·D; floor-div is
        # sign-safe fdiv so Spark and the oracle agree on negatives
        upd = (
            assign(cents)
            .select(
                F.col("__best.c").alias("__c"),
                F.posexplode("__qv").alias("__pos", "__q"),
            )
            .groupBy("__c", "__pos")
            .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .select(
                "__c",
                "__pos",
                F.expr("(__s - ((__s % __n) + __n) % __n) div __n").alias("__cv"),
            )
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in upd.collect():  # bounded: k·D integers (driver metadata)
            by_c.setdefault(r["__c"], {})[r["__pos"]] = r["__cv"]
        cents = [
            (cid, [dims[p] for p in sorted(dims)]) for cid, dims in sorted(by_c.items())
        ]

    final = assign(cents)
    return final.select(
        F.col("__id").alias(id_col),
        F.col("__best.c").alias("cluster"),
        F.col("__best.d").alias("dist2"),
    )


def pca_top_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    quant: int = 10**6,
    scale: int = 10**6,
) -> DataFrame:
    """Top PRINCIPAL COMPONENT by integer fixed-point power iteration —
    engine-exact PCA for the embedding pipeline (anisotropy diagnosis,
    whitening direction, dominant-topic axis). Float power iteration has
    the same certification problem as float k-means: reduce-order drift
    compounds per iteration. Here every step is exact integer
    arithmetic, so the whole computation is bit-identical anywhere and
    unrolls into a CTE chain (the pagerank/kmeans trick, applied to a
    D-dimensional recurrence):

    * Gram matrix A = Σ_n q_n q_nᵀ over 1e-6-quantized elements — ONE
      row-local pairwise expansion partial-aggregated into a D² key
      space, collected as D² exact integers (driver metadata: 64² = 4096
      values, the k-means-centroid class).
    * v₀ = scale·e₀; iterate  w = A v ;  v' = floor(w·scale / max|w|)
      (mathematical floor, expressed sign-safely — so components stay
      integers in [−scale, scale] and no square root ever appears; L∞
      normalization replaces the L2 norm precisely because it keeps the
      arithmetic closed over integers).
    * after ``iters`` rounds emit (pos, v_i, component, eigval) with the
      Rayleigh quotient eigval = (vᵀAv)/(vᵀv)·(1/quant²) from exact
      integers via one fixed double expression.

    Scale shape: the D²-per-row expansion is linear work any exact Gram
    computation pays, partial-aggregated map-side into D² keys; the
    iteration itself is driver arithmetic on D integers (Python bigints
    — no overflow at any magnitude; the SQL twin uses HUGEINT/DECIMAL).
    Five iterations is a spec'd computation, not a convergence claim —
    both engines compute the identical vector wherever it stands.
    """
    dec38 = "decimal(38,0)"
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("long"),
    )
    ex = emb.select(F.col(id_col).alias("__rid"), F.posexplode(qv).alias("__pos", "__q"))
    a = ex.select(F.col("__rid"), F.col("__pos").alias("__i"), F.col("__q").alias("__qa"))
    b = ex.select(F.col("__rid"), F.col("__pos").alias("__j"), F.col("__q").alias("__qb"))
    gram_rows = (
        a.join(b, "__rid")
        .groupBy("__i", "__j")
        .agg(F.sum(F.col("__qa").cast(dec38) * F.col("__qb")).alias("__g"))
        .collect()
    )
    if not gram_rows:
        raise ValueError("empty embedding table")
    d = max(r["__i"] for r in gram_rows) + 1
    A = [[0] * d for _ in range(d)]
    for r in gram_rows:
        A[r["__i"]][r["__j"]] = int(r["__g"])

    v = [scale] + [0] * (d - 1)
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError("zero Gram action: degenerate input")
        # python // floors; the SQL twin uses the sign-safe fdiv to match
        v = [(w[i] * scale) // m for i in range(d)]

    w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
    num = sum(v[i] * w[i] for i in range(d))
    den = sum(x * x for x in v)
    # mirror the twin's CAST-then-divide tree exactly (big ints round at
    # the cast, not inside the division)
    eig = (float(num) / float(den)) / (float(quant) * float(quant))
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, int(v[i]), float(v[i]) / float(scale), eig) for i in range(d)],
        "pos int, v_i long, component double, eigval double",
    )


def kmeans_silhouette(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    quant: int = 10**6,
) -> DataFrame:
    """Per-cluster SIMPLIFIED SILHOUETTE for :func:`kmeans_exact` — the
    certified clustering-quality readout: for each point, a = squared
    distance to its OWN centroid, b = min squared distance to any OTHER
    centroid, s = (b − a) / max(a, b) ∈ (−1, 1]; the report is each
    cluster's size and mean s. Near 1 = tight and well-separated; near 0
    = boundary soup; negative = mis-assigned mass.

    Spec choices that keep it hash-exact: the SQUARED-distance variant
    (classic silhouette's sqrt would leave the integers; the squared
    form preserves the sign and the [worse/better] ordering), a and b
    are exact BIGINTs from the same literal-centroid row-local distances
    as the assignment pass, s is one fixed double expression, and the
    order-sensitive mean goes through the DECIMAL(28,14) detour like the
    LM scorers. k = 1 raises (no "other centroid" exists).

    Scale shape: one extra map-only pass over the assignment relation
    (all k distances are row-local; a is the assignment's own min, b a
    second array_min over the non-assigned structs) + one |clusters|-key
    rollup. Output: (cluster, n, mean_silhouette).
    """
    if k < 2:
        raise ValueError("silhouette needs k >= 2")
    assigned = kmeans_exact(emb, id_col, vec_col, k, iters, quant)
    q = emb.select(
        F.col(id_col), _quant_expr(vec_col, quant).alias("__qv")
    ).join(assigned.select(id_col, "cluster"), id_col)
    # recompute the final centroids exactly as kmeans_exact's last update
    # would: they are a pure function of the assignment (sign-safe fdiv)
    upd = (
        q.select("cluster", F.posexplode("__qv").alias("__pos", "__q"))
        .groupBy("cluster", "__pos")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__n"))
        .select(
            "cluster",
            "__pos",
            F.expr("(__s - ((__s % __n) + __n) % __n) div __n").alias("__cv"),
        )
        .collect()
    )
    by_c: dict[int, dict[int, int]] = {}
    for r in upd:
        by_c.setdefault(r["cluster"], {})[r["__pos"]] = r["__cv"]
    cents = [(c, [d[p] for p in sorted(d)]) for c, d in sorted(by_c.items())]
    if len(cents) < 2:
        raise ValueError("all mass collapsed into one cluster")
    own = None
    for cid, cv in cents:
        dist = _dist2(F.col("__qv"), cv)
        own = F.when(F.col("cluster") == cid, dist) if own is None else own.when(
            F.col("cluster") == cid, dist
        )
    other = F.array_min(
        F.array(
            *[
                F.when(F.col("cluster") == cid, F.lit(None).cast("long")).otherwise(
                    _dist2(F.col("__qv"), cv)
                )
                for cid, cv in cents
            ]
        )
    )
    s = (
        (F.col("__b") - F.col("__a")).cast("double")
        / F.greatest(F.col("__a"), F.col("__b")).cast("double")
    )
    scored = q.select(
        "cluster", own.alias("__a"), other.alias("__b")
    ).select(
        "cluster",
        F.when(
            F.greatest(F.col("__a"), F.col("__b")) == 0, F.lit(0.0)
        ).otherwise(s).alias("__s"),
    )
    return scored.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("__s").cast("decimal(28,14)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_silhouette"),
    )
