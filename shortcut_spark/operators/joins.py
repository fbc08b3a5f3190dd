"""Join operators Spark lacks natively: as-of and bounded range joins.

The reference has no joins at all (SURVEY §2.2 — nothing joins two
Stores); these are extension surface, built as compositions of existing
DataFrame ops per the preference order (composition > applyInPandas >
mapPartitions):

- **as-of join**: equi-join on the key + inequality filter + keep the
  latest right row per left row. Expressed as join → groupBy max (when
  only the as-of value is needed) or join → row_number (full right row).
  At 100 TB the equi-join shuffles on the key exactly like any join;
  the per-left-row reduction is a map-side-combinable aggregate, so no
  skew beyond the key distribution itself.
- **range join**: |ts_a - ts_b| ≤ window pairs. The naive form is a
  quadratic theta-join; the scale path buckets time into window-sized
  cells and equi-joins on (key, cell) for cell and cell+1 — candidates
  are only same-or-adjacent buckets, then the exact predicate filters.
  This is the standard bucketized interval join (guide: "bucketize the
  range key + equi-join on bucket + filter").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "asof_max",
    "range_pairs_within",
    "salted_join",
    "fuzzy_join",
    "interval_overlap_pairs",
]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side's hot keys are spread across
    ``salts`` sub-keys (deterministic row hash), the small side is
    replicated once per salt, and the join runs on (key, salt) — no single
    reducer owns a hot key. Semantically identical to ``big.join(small,
    key, how)`` for inner/left joins on a unique-keyed small side.

    Spark's AQE skew-join handles most cases at runtime; this explicit form
    is for when the skew is known and AQE's split thresholds don't bite
    (or for deterministic plan shapes in tests).
    """
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def asof_max(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_value",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row: the right timestamp matched as-of (value-only
    form — ties on the timestamp are inherently deterministic because the
    value IS the timestamp). Left rows keep NULL when nothing matched;
    every left row (duplicates included) yields exactly one output row.

    ``direction`` is the pandas ``merge_asof`` triple:

    * ``"backward"`` (default) — latest right_ts <= left_ts;
    * ``"forward"``  — earliest right_ts >= left_ts;
    * ``"nearest"``  — whichever of the two is closer in absolute time
      (ties break backward, deterministically).

    ``tolerance_s`` (seconds) nulls out matches farther than the bound —
    with it, as-of degrades gracefully to "no match" instead of dragging
    in arbitrarily stale rows.

    DuckDB twin: native ``ASOF LEFT JOIN`` for backward; forward/nearest
    twin as grouped min/max conditional aggregates.

    Implemented as a union + ordered window passes, NOT a theta join:
    both sides are tagged and merged on a single time axis; backward is
    ``last(right_ts, ignorenulls)`` over rows-unbounded-preceding (right
    rows sort before left rows on ties so ``<=`` holds), forward is the
    mirrored ``first`` over rows-to-unbounded-following (right rows after
    left rows on ties so ``>=`` holds), nearest computes both in the SAME
    window pass — still one shuffle on the key. The theta-join form
    materializes |left| x |right| rows per hot key before re-aggregating,
    which dies at 100 TB; this form's per-key cost is the sorted row count.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    lt_type = left.schema[left_ts].dataType
    rts_type = right.schema[right_ts].dataType
    lk_type = left.schema[left_key].dataType
    left_struct = T.StructType(left.schema.fields)

    def axis(c):
        # one comparable time axis; a date/timestamp mix promotes to
        # timestamp, mirroring Spark's own coercion for date <= timestamp
        return c if lt_type == rts_type else c.cast("timestamp")

    l = left.select(
        F.col(left_key).alias("__k"),
        axis(F.col(left_ts)).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rts_type).alias("__rts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r = right.select(
        F.col(right_key).cast(lk_type).alias("__k"),
        axis(F.col(right_ts)).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__rts"),
        F.lit(None).cast(left_struct).alias("__row"),
    ).filter(
        # SQL join semantics: a NULL key matches NOTHING. The window
        # partition would otherwise GROUP the null keys (unlike a join),
        # quietly matching null-keyed left rows to null-keyed right rows.
        # Dropping null-key right rows leaves null-key LEFT rows alone in
        # their partition — they stay in the output with a NULL match,
        # the left-join contract.
        F.col("__k").isNotNull()
    )
    # nulls sort first: null-ts left rows see no right rows (match = NULL),
    # null-ts right rows carry a null __rts that ignorenulls skips — both
    # mirror SQL comparison-with-null semantics.
    # Tie order: right-before-left serves backward's <=; forward reads
    # STRICTLY after the current row and adds an explicit ==-tie coalesce,
    # so one physical sort serves both directions (nearest pays one
    # window partitioning, not two).
    order = [F.col("__t").asc(), F.col("__is_left").asc()]
    w_back = W.partitionBy("__k").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = W.partitionBy("__k").orderBy(*order).rowsBetween(1, W.unboundedFollowing)
    w_tie = W.partitionBy("__k", "__t").orderBy(F.col("__is_left").asc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    merged = l.unionByName(r)
    if direction in ("backward", "nearest"):
        merged = merged.withColumn("__back", F.last("__rts", ignorenulls=True).over(w_back))
    if direction in ("forward", "nearest"):
        # a right row at exactly __t sorts BEFORE the left row, so the
        # strictly-after window misses it — the same-(key, t) max fills it
        merged = merged.withColumn(
            "__fwd",
            F.coalesce(
                F.max("__rts").over(w_tie),
                F.first("__rts", ignorenulls=True).over(w_fwd),
            ),
        )
    if direction == "backward":
        match = F.col("__back")
    elif direction == "forward":
        match = F.col("__fwd")
    else:
        # cast-to-double keeps sub-second precision (unix_timestamp truncates)
        d_back = F.abs(F.col("__t").cast("double") - axis(F.col("__back")).cast("double"))
        d_fwd = F.abs(F.col("__t").cast("double") - axis(F.col("__fwd")).cast("double"))
        match = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            .when(d_back <= d_fwd, F.col("__back"))  # tie → backward
            .otherwise(F.col("__fwd"))
        )
    out = merged.withColumn(out_col, match).filter(F.col("__is_left") == 1)
    if tolerance_s is not None:
        dist = F.abs(F.col("__t").cast("double") - axis(F.col(out_col)).cast("double"))
        out = out.withColumn(
            out_col, F.when(dist <= F.lit(float(tolerance_s)), F.col(out_col))
        )
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns], F.col(out_col)
    )


def range_pairs_within(
    df: DataFrame,
    key: str,
    ts_epoch: str,
    id_col: str,
    window_s: int,
) -> DataFrame:
    """All pairs (a < b by id) sharing ``key`` with |ts_a - ts_b| <= window.

    Bucketized: cell = floor(ts / window); a pair within the window must
    land in the same or adjacent cells, so candidates come from two
    equi-joins on (key, cell) — never a full per-key cross join.
    """
    cells = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(ts_epoch).alias("__ts"),
        F.floor(F.col(ts_epoch) / window_s).alias("__cell"),
    )
    b = cells.select(
        F.col("__k").alias("__kb"),
        F.col("__id").alias("__id_b"),
        F.col("__ts").alias("__ts_b"),
        F.col("__cell").alias("__cell_b"),
    )
    cand = None
    for shift in (0, 1):
        part = cells.join(
            b,
            (cells["__k"] == b["__kb"]) & (b["__cell_b"] == cells["__cell"] + shift),
        ).select(
            cells["__k"].alias("k"),
            F.col("__id").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.col("__ts").alias("ts_a"),
            F.col("__ts_b").alias("ts_b"),
        )
        cand = part if cand is None else cand.unionByName(part)
    # normalize orientation AFTER the candidate join: an adjacent-cell pair
    # appears only once (left row in the earlier cell), and its id order is
    # independent of its time order
    return (
        cand.filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("ts_a") - F.col("ts_b")) <= window_s)
        )
        .select(
            F.col("k").alias(key),
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )


# _auto_suffix_len results memoized per (left plan, right plan, columns):
# the sizing histogram is one tiny job per distinct input pair, not per call
_SUFFIX_CACHE: dict[tuple, int] = {}
_SUFFIX_CACHE_MAX = 256


def _auto_suffix_len(
    left: DataFrame, right: DataFrame, left_col: str, right_col: str
) -> int:
    """Derive the blocking-key length from the DATA (the ``lsh_params_for``
    precedent: auto-size from measurement, pin literals in certified
    queries): take the exact P5 of the observed string lengths over BOTH
    sides and sit the block length one char BELOW it, clamped to [3, 6] —
    so ≥95% of strings are strictly longer than the block and never hit
    the short-string cliff (a string ≤ block length has prefix block =
    suffix block = the whole string, and one typo anywhere hides the
    pair).

    P5 is computed from a length histogram (one tiny job: ≤ a few hundred
    distinct lengths regardless of row count) with pure integer
    arithmetic — smallest length L whose cumulative count satisfies
    20·cum ≥ N — so an oracle twin can reproduce the derived value
    exactly on any engine. NULL and empty strings are excluded (they
    cannot pair with anything at positive edit distance anyway)."""
    try:
        key = (left.semanticHash(), right.semanticHash(), left_col, right_col)
    except Exception:
        key = None
    if key is not None and key in _SUFFIX_CACHE:
        return _SUFFIX_CACHE[key]
    lens = (
        left.select(F.length(F.col(left_col)).alias("l"))
        .unionAll(right.select(F.length(F.col(right_col)).alias("l")))
        .filter(F.col("l") >= 1)
        .groupBy("l")
        .count()
        .collect()
    )
    if not lens:
        return 6
    total = sum(r["count"] for r in lens)
    cum = 0
    p5 = max(r["l"] for r in lens)
    for r in sorted(lens, key=lambda r: r["l"]):
        cum += r["count"]
        if 20 * cum >= total:
            p5 = r["l"]
            break
    n = min(6, max(3, p5 - 1))
    if key is not None:
        if len(_SUFFIX_CACHE) >= _SUFFIX_CACHE_MAX:
            _SUFFIX_CACHE.clear()
        _SUFFIX_CACHE[key] = n
    return n


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block=None,
    suffix_len: int | None = None,
) -> DataFrame:
    """Blocked fuzzy string join — the record-linkage / entity-resolution
    primitive: candidate pairs come from a cheap BLOCKING key (equality
    join), then exact Levenshtein distance verifies each candidate.

    An unblocked edit-distance join is O(N x M) — never viable. Blocking
    bounds the work to same-block pairs, the same candidate/verify split
    as LSH banding. Default blocking is MULTI-PASS (standard ER
    practice): candidates are the union of a PREFIX block (first
    ``suffix_len`` chars, lowercased) and a SUFFIX block (last
    ``suffix_len`` chars) — a typo in one end of the string is still
    caught by the block riding the other end; a true pair is missed only
    when typos corrupt both ends. The union is overlap-free without any
    row-id bookkeeping: the suffix pass keeps only pairs whose prefixes
    DIFFER (pairs with equal prefixes were already emitted by the prefix
    pass), so duplicate input rows pass through undisturbed and the SQL
    twin is a plain ``(prefix_eq OR suffix_eq)`` predicate. ~2× candidate
    cost vs single-pass, two shuffles instead of one. Pass ``block`` for
    a custom single-pass key expression.

    SHORT-STRING CLIFF: for strings no longer than ``suffix_len`` the
    prefix block and the suffix block are both the WHOLE string, so a
    single typo anywhere corrupts both blocks and the pair is missed
    entirely. The DEFAULT (``suffix_len=None``) therefore auto-sizes
    from the data: one char below the exact P5 of the observed length
    distribution over both sides, clamped to [3, 6] (see
    :func:`_auto_suffix_len`) — short person-name corpora derive 3, long
    document-title corpora keep 6. Pin ``suffix_len`` explicitly to
    reproduce a fixed blocking (certified queries pin their literal so
    the SQL twin's blocking predicate matches); strings at or below the
    floor of 3 still cliff, the documented residual. Smaller blocks
    trade more candidate pairs for recall, the standard ER dial.

    Output: all left + right columns (pre-alias any collisions) plus
    ``lev_dist``. Levenshtein is exact and engine-portable (same values
    in DuckDB), so the operator is oracle-checkable.
    """
    verify = lambda cand: (
        cand.withColumn(
            "lev_dist", F.levenshtein(F.col(left_col), F.col(right_col)).cast("long")
        ).filter(F.col("lev_dist") <= max_distance)
    )
    if block is not None:
        l = left.withColumn("__blk", block(F.col(left_col)))
        r = right.withColumn("__blk", block(F.col(right_col)))
        return verify(l.join(r, "__blk")).drop("__blk")

    if suffix_len is None:
        suffix_len = _auto_suffix_len(left, right, left_col, right_col)
    pre = lambda c: F.lower(F.substring(c, 1, suffix_len))
    suf = lambda c: F.lower(F.substring(c, -suffix_len, suffix_len))
    la = (
        left.withColumn("__pblk", pre(F.col(left_col)))
        .withColumn("__sblk", suf(F.col(left_col)))
        .alias("l")
    )
    ra = (
        right.withColumn("__pblk", pre(F.col(right_col)))
        .withColumn("__sblk", suf(F.col(right_col)))
        .alias("r")
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns
    ]
    c1 = la.join(ra, F.col("l.__pblk") == F.col("r.__pblk")).select(*out_cols)
    c2 = la.join(
        ra,
        (F.col("l.__sblk") == F.col("r.__sblk"))
        & (F.col("l.__pblk") != F.col("r.__pblk")),
    ).select(*out_cols)
    return verify(c1.unionByName(c2))


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    cell_s: int = 3600,
) -> DataFrame:
    """All pairs of rows whose [start, end] intervals OVERLAP (inclusive
    bounds: touching endpoints count, overlap_s = 0) — the interval×
    interval upgrade of the point-in-window range join
    (:func:`range_pairs_within`).

    Scale shape — GRID bucketing, the standard interval-join plan:
    each interval replicates to the ``cell_s``-wide time cells it spans
    (factor ≈ duration/cell_s + 1; pick cell_s near the typical
    duration), candidates come from ONE equi-join on the cell, and each
    overlapping pair is counted EXACTLY ONCE without a distinct: a
    candidate survives only in the canonical cell containing the
    overlap's start (``floor(max(starts)/cell_s)``), which both
    intervals' cell ranges provably cover. Never an all-pairs theta
    join; no dedup shuffle.

    Output: (id_a, id_b, overlap_s) with id_a < id_b.
    """
    from ..functions import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.col(start_col).cast("long").alias("__st"),
        F.col(end_col).cast("long").alias("__en"),
    )
    w = F.lit(int(cell_s))
    cells = base.select(
        "__id", "__st", "__en",
        F.explode(F.sequence(F.floor(F.col("__st") / w), F.floor(F.col("__en") / w))).alias(
            "__cell"
        ),
    )
    a = cells.select(
        F.col("__id").alias("__id_a"), F.col("__st").alias("__st_a"),
        F.col("__en").alias("__en_a"), "__cell",
    )
    b = cells.select(
        F.col("__id").alias("__id_b"), F.col("__st").alias("__st_b"),
        F.col("__en").alias("__en_b"), "__cell",
    )
    pairs = a.join(b, "__cell").filter(
        (F.col("__id_a") < F.col("__id_b"))
        & (F.col("__st_a") <= F.col("__en_b"))
        & (F.col("__st_b") <= F.col("__en_a"))
        & (F.col("__cell") == F.floor(F.greatest("__st_a", "__st_b") / w))
    )
    return pairs.select(
        F.col("__id_a").alias("id_a"),
        F.col("__id_b").alias("id_b"),
        (F.least("__en_a", "__en_b") - F.greatest("__st_a", "__st_b"))
        .cast("long")
        .alias("overlap_s"),
    )
