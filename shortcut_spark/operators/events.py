"""Event-sequence analytics: funnels and cohort retention.

The reference has no event surface (opaque values, ``src/lib.rs:75``);
these are extension operators in the LLM-pipeline/product-analytics family
(SURVEY §2.3), built as window/aggregate compositions with exact DuckDB
twins.

Scale shape (100 TB): both operators shuffle ONCE on the user key. The
funnel's chained per-step window minimums share a single exchange (same
unordered partitioning for every step); retention is two aggregates that
reuse the user-keyed shuffle before the small cohort rollup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "funnel_reach",
    "retention_cohorts",
    "gapfill_locf",
    "gapfill_interp",
    "windowed_topk",
    "rolling_active_users",
    "daily_anomalies",
    "transition_counts",
    "last_touch_attribution",
    "cube_rollup",
    "session_top_paths",
    "session_cooccurrence",
    "json_field_profile",
    "pivot_daily_matrix",
    "ab_test",
    "robust_anomalies",
    "sequence_match",
    "melt_matrix",
]


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Per-user funnel progression through ordered ``steps``.

    Step i's timestamp is the EARLIEST event of that type at-or-after the
    user's step-(i-1) timestamp (ties allowed); a user who never performs
    step i has NULL from there on. One row per user: step epochs plus
    ``reached`` (how many consecutive steps completed).

    ``max_gap_s`` adds the conversion-window semantics real funnels need:
    step i only counts within ``max_gap_s`` seconds of step i−1 (epoch
    comparison, second floor) — "purchased within 7 days of clicking",
    not "purchased eventually". A too-late step leaves NULL from there
    on, exactly like a missing one. Same plan either way.

    All step minimums are unordered window aggregates over the same user
    partitioning, so the chain plans as ONE shuffle with stacked window
    operators — no per-step join round trips.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col(ts_col) >= F.col(prev))
            if max_gap_s is not None:
                cond = cond & (
                    F.unix_timestamp(F.col(ts_col))
                    <= F.unix_timestamp(F.col(prev)) + F.lit(int(max_gap_s))
                )
        cur = f"__t{i}"
        df = df.withColumn(cur, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = cur
    tcols = [f"__t{i}" for i in range(len(steps))]
    per_user = df.groupBy(user_col).agg(
        *[F.min(t).alias(t) for t in tcols]  # per-user constants; min = the value
    )
    reached = sum(
        (F.col(t).isNotNull().cast("int") for t in tcols), F.lit(0)
    ).cast("long")
    return per_user.select(
        F.col(user_col),
        reached.alias("reached"),
        *[
            F.unix_timestamp(F.col(t)).alias(f"t{i}_epoch")
            for i, t in enumerate(tcols)
        ],
    )


def retention_cohorts(
    events: DataFrame,
    cohort_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    ``cohort_type`` event; for each (cohort week, weeks-since) the count of
    cohort users active that week. Users without a cohort event are
    excluded; activity before the cohort event doesn't count.

    Two user-keyed aggregates (first cohort event, distinct active weeks)
    then a small rollup — the shuffles are on user then on the tiny
    (cohort, offset) key space.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    cohort = (
        events.filter(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(wk).alias("__cohort_wk"))
    )
    active = events.select(F.col(user_col), wk.alias("__wk")).distinct()
    return (
        active.join(cohort, user_col)
        .filter(F.col("__wk") >= F.col("__cohort_wk"))
        .select(
            F.unix_timestamp("__cohort_wk").alias("cohort_epoch"),
            F.floor(
                (F.unix_timestamp("__wk") - F.unix_timestamp("__cohort_wk"))
                / F.lit(7 * 24 * 3600)
            ).alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_epoch", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def gapfill_locf(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Time-bucket rollup with GAP FILLING and last-observation-carried-
    forward — the hypertable `time_bucket_gapfill + locf` shape: every key
    gets a dense bucket spine from its first to its last observation;
    empty buckets appear with n_events = 0 and the bucket's aggregate
    carried forward from the most recent non-empty bucket.

    Shuffle shape: the raw table shuffles ONCE into (key, bucket)
    aggregates; the spine is *generated* per key (sequence + explode — a
    map stage over the tiny per-key min/max table, never a shuffle of raw
    rows); the LOCF pass is one window over the same (key, bucket)
    partitioning. Spine length is keys × span/bucket — independent of raw
    row count, so at 100 TB it is negligible next to the fact scan.

    Output: (key, bucket_epoch, n_events, sum_value nullable,
    locf_sum_value).
    """
    from pyspark.sql import Window as W

    from ..functions import dsum

    step = F.lit(int(bucket_seconds)).cast("long")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds) * bucket_seconds
    ).cast("long")
    base = events.groupBy(F.col(key_col), bucket.alias("bucket_epoch")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(value_col, "sum_value")
    )
    span = base.groupBy(key_col).agg(
        F.min("bucket_epoch").alias("__mn"), F.max("bucket_epoch").alias("__mx")
    )
    spine = span.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias("bucket_epoch"),
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket_epoch")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(base, [key_col, "bucket_epoch"], "left")
        .select(
            F.col(key_col),
            F.col("bucket_epoch"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.col("sum_value"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_sum_value"),
        )
    )
def windowed_topk(
    events, k: int = 3, ts_col: str = "ts", by_col: str = "event_type"
) -> "DataFrame":
    """Top-k values per time window (the trending-now query): hourly
    tumbling counts of ``by_col``, rank ≤ k inside each window by count
    (ties break on the value for total-order determinism).

    Shuffle shape: one partial-aggregated count shuffle on (hour, value),
    then a rank window partitioned by the HOUR — thousands of keys, each
    holding only the distinct values seen that hour, so no single-reducer
    funnel. Output: (hour_epoch, rank, value, n_events).
    """
    from pyspark.sql import Window as W

    counts = events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("hour_epoch"),
        F.col(by_col).alias("value"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("hour_epoch").orderBy(F.col("n_events").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("hour_epoch", "rank", "value", "n_events")
    )


def gapfill_interp(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """:func:`gapfill_locf`'s numeric sibling — LINEAR interpolation
    across empty buckets (the hypertable `interpolate` shape): an empty
    bucket's estimate is the straight line between the nearest non-empty
    bucket on each side. The spine spans first..last observation per key,
    so both neighbors always exist; a non-empty bucket interpolates to
    its own value exactly (zero-width step on the guard branch).

    Same shuffle shape as LOCF: one (key, bucket) rollup, a generated
    spine, and two window passes (backward last / forward first, both
    IGNORE NULLS) over the SAME key partitioning — one exchange total.
    Arithmetic is a single double expression mirrored verbatim in the
    DuckDB twin, so interpolated values hash-compare exactly.

    Output: (key, bucket_epoch, n_events, sum_value nullable,
    interp_sum_value).
    """
    from pyspark.sql import Window as W

    from ..functions import dsum

    step = F.lit(int(bucket_seconds)).cast("long")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds) * bucket_seconds
    ).cast("long")
    base = events.groupBy(F.col(key_col), bucket.alias("bucket_epoch")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(value_col, "sum_value")
    )
    span = base.groupBy(key_col).agg(
        F.min("bucket_epoch").alias("__mn"), F.max("bucket_epoch").alias("__mx")
    )
    spine = span.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias("bucket_epoch"),
    )
    back = (
        W.partitionBy(key_col)
        .orderBy("bucket_epoch")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy("bucket_epoch")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("sum_value").isNotNull(), F.col("bucket_epoch"))
    joined = spine.join(base, [key_col, "bucket_epoch"], "left").select(
        F.col(key_col),
        F.col("bucket_epoch"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("sum_value"),
        F.last("sum_value", ignorenulls=True).over(back).alias("__pv"),
        F.last(obs_bucket, ignorenulls=True).over(back).alias("__pb"),
        F.first("sum_value", ignorenulls=True).over(fwd).alias("__nv"),
        F.first(obs_bucket, ignorenulls=True).over(fwd).alias("__nb"),
    )
    interp = F.when(F.col("__nb") == F.col("__pb"), F.col("__pv")).otherwise(
        F.col("__pv")
        + (F.col("__nv") - F.col("__pv"))
        * (
            (F.col("bucket_epoch") - F.col("__pb")).cast("double")
            / (F.col("__nb") - F.col("__pb")).cast("double")
        )
    )
    return joined.select(
        F.col(key_col),
        "bucket_epoch",
        "n_events",
        "sum_value",
        interp.alias("interp_sum_value"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling N-day active users (the DAU/WAU/MAU family): for every day
    d in the data's span, the count of DISTINCT users active in
    [d-N+1, d]. COUNT(DISTINCT) over a sliding frame has no direct window
    form; the scalable shape is CONTRIBUTION EXPLODE: each distinct
    (user, day) pair contributes to the N report days it can appear in,
    then one groupBy(report_day) count-distinct. Blow-up is exactly N×
    the (user, day) pair count — pairs, not raw events, and N is small —
    followed by ONE shuffle on the day key. No day-range self-join, no
    per-day re-scan. Report days are clipped to the observed span (edge
    windows are partial by definition).

    Output: (day_epoch, n_active) for every day min_day..max_day.
    """
    day = (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) * 86400).cast("long")
    pairs = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    bounds = F.broadcast(pairs.agg(F.min("d").alias("__mn"), F.max("d").alias("__mx")))
    contrib = pairs.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit((window_days - 1) * 86400), F.lit(86400))
        ).alias("day_epoch"),
    )
    return (
        contrib.crossJoin(bounds)
        .filter((F.col("day_epoch") >= F.col("__mn")) & (F.col("day_epoch") <= F.col("__mx")))
        .groupBy("day_epoch")
        .agg(F.count_distinct("u").cast("long").alias("n_active"))
    )


def daily_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-group daily-volume anomaly detection: z-score each (group,
    day) event count against ITS group's mean/stddev of daily counts and
    flag |z| > threshold — the ingestion-monitoring query every pipeline
    runs (a scraper dying or double-feeding shows up as a volume z-spike
    long before content checks notice).

    Scale shape: one (group, day) count shuffle over pairs (not raw
    events), then the per-group moments come from ONE window over groups
    (group cardinality partitions; each holds #days rows — bounded), not
    a self-join. Determinism: the moments derive from integer daily
    counts (exact in double far below 2^53), so mean/variance/sqrt are
    bit-reproducible across engines; z is rounded to 6 dp for the hash.

    Output: (group, day_epoch, n_events, z, is_anomaly) for every day
    with at least one event.
    """
    from pyspark.sql import Window as W

    day = (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) * 86400).cast("long")
    daily = (
        events.select(F.col(group_col).alias("grp"), day.alias("day_epoch"))
        .groupBy("grp", "day_epoch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = W.partitionBy("grp")
    # population moments from integer sums: n, sum, sumsq are exact longs,
    # so mean/var are identical double expressions in any engine
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum("n_events").over(w).cast("double")
    sq = F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("double")
    mean = s / n
    var = (sq - s * s / n) / n
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("n_events") - mean) / std).otherwise(F.lit(0.0))
    return daily.select(
        F.col("grp").alias(group_col),
        "day_epoch",
        "n_events",
        F.round(z, 6).alias("z"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def transition_counts(
    events: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k user-path transitions (the behavioral Markov matrix): for
    each user's event stream ordered by (ts, event_id) — the id breaks
    timestamp ties so the sequence is total-ordered and deterministic —
    count every consecutive (prev_type → next_type) pair, rank globally.

    Scale shape: ONE user-keyed shuffle feeds the lag window (per-user
    partitions, never a global sort), then one partial-aggregated count
    shuffle on the |types|² pair space; top-k is a sort-limit over that
    tiny aggregate. Output: (prev_type, next_type, n_transitions, rank),
    rank ties broken by the pair for total order.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    rw = W.orderBy(
        F.col("n_transitions").desc(), F.col("prev_type"), F.col("next_type")
    )
    # the rank window runs over the aggregated |types|^2 rows, not raw data
    return (
        pairs.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "prev_type", "next_type", "n_transitions")
    )


def last_touch_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    channel_types: tuple = ("click", "view"),
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """LAST-TOUCH attribution: every conversion event is credited to the
    latest preceding channel event (click/view) of the same user within
    ``window_days`` — the standard marketing-attribution primitive.

    Single-shuffle as-of shape (the ``joins.asof_max`` union trick, with
    the matched row's (ts, id, type) carried in a struct): both sides
    merge on one time axis per user, ``last(ignorenulls)`` picks the
    attribution, the window bound nulls out stale matches. Ties at the
    same timestamp resolve to the highest event id — deterministic, and
    exactly what the SQL twin's (ts DESC, id DESC) rank picks. Per-key
    cost is the sorted event count; the theta-join form would
    materialize |purchases|×|channel| rows per hot user first.

    Output: (purchase_id, user_id, purchase_epoch, attributed_id,
    attributed_type, lag_s) — NULL attribution for unmatched conversions.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    p = events.filter(F.col(type_col) == purchase_type)
    m = events.filter(F.col(type_col).isin(*channel_types))
    mstruct = T.StructType(
        [
            T.StructField("ts", events.schema[ts_col].dataType),
            T.StructField("eid", T.LongType()),
            T.StructField("etype", T.StringType()),
        ]
    )
    l = p.select(
        F.col(user_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(mstruct).alias("__m"),
        F.col(id_col).alias("purchase_id"),
    )
    r = m.select(
        F.col(user_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).cast("long").alias("eid"),
            F.col(type_col).cast("string").alias("etype"),
        ).alias("__m"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__m.eid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "__att", F.last("__m", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1)
    lag = F.unix_timestamp("__t") - F.unix_timestamp("__att.ts")
    in_window = lag <= F.lit(window_days * 86400)
    return out.select(
        "purchase_id",
        F.col("__k").alias(user_col),
        F.unix_timestamp("__t").alias("purchase_epoch"),
        F.when(in_window, F.col("__att.eid")).alias("attributed_id"),
        F.when(in_window, F.col("__att.etype")).alias("attributed_type"),
        F.when(in_window, lag).alias("lag_s"),
    )


def cube_rollup(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Native multi-dimensional CUBE over (event_type, day): all four
    grouping sets — per type+day, per type, per day, grand total — in
    ONE pass. Spark computes cube/rollup as a single expand+aggregate
    (each input row fans into its grouping sets map-side, partial aggs
    combine before the shuffle), which beats four separate groupBys by
    reading the scan once; ``grouping_id`` disambiguates a NULL group
    key from a NULL produced by the rollup.

    Output: (event_type, day_epoch, gid, n_events, sum_value)."""
    from ..functions import dsum

    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
        * F.lit(86400)
    ).alias("day_epoch")
    return (
        events.select(F.col(type_col), day, F.col(value_col))
        .cube(type_col, "day_epoch")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col, "sum_value"),
        )
        .select(type_col, "day_epoch", "gid", "n_events", "sum_value")
    )


def session_top_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    n: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_events: int | None = None,
) -> DataFrame:
    """TOP USER JOURNEYS: the most frequent length-``n`` event-type
    sequences inside gap-based sessions — path mining, the "what do
    users actually do" query. Sessionization is the same lag+cumsum
    composition as :func:`~..streaming.sessionize` (break iff gap >
    ``gap_minutes``); each session's ordered type list is sliced into
    sliding n-grams ("view>click>purchase") and counted corpus-wide.

    Scale shape: one user-key shuffle for the session windows, one
    session-key collect (bounded by session length — the open-tail
    trade every sessionizer makes), then the n-gram counts partial-
    aggregate map-side into a tiny |distinct paths| key space; top-k is
    distributed TakeOrdered. Ties rank by path string: deterministic.

    ``max_events`` (default None = unbounded) truncates each session to
    its first that-many events BEFORE the collect — the guard for the
    one residual skew hazard the measured probe left open
    (docs/SCALE.md: a bot user whose events never gap ``gap_minutes``
    forms one corpus-length session, and an unbounded per-session
    collect_list is an OOM at that key). Truncation costs one
    row_number on the session partitioning already present — no extra
    shuffle.

    Output: (rank, path, n_sessions_rows: count of occurrences).
    """
    from pyspark.sql import Window as W

    w_user = W.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60)
    with_break = events.withColumn(
        "__brk",
        (
            F.coalesce(
                F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w_user)),
                F.lit(None).cast("long"),
            )
            > gap
        ).cast("int"),
    ).withColumn(
        "__sess", F.sum(F.coalesce(F.col("__brk"), F.lit(1))).over(w_user)
    )
    if max_events is not None:
        w_sess = W.partitionBy(user_col, "__sess").orderBy(ts_col, id_col)
        with_break = with_break.withColumn(
            "__k", F.row_number().over(w_sess)
        ).filter(F.col("__k") <= max_events)
    types = (
        with_break.groupBy(user_col, "__sess")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(id_col).alias("i"),
                            F.col(type_col).cast("string").alias("y"),
                        )
                    )
                ),
                lambda s: s["y"],
            ).alias("__types")
        )
    )
    grams = types.select(
        F.explode(
            # sequence(1, 0) yields a DESCENDING [1,0] in Spark, so the
            # short-session case needs an explicit empty array
            F.expr(
                f"CASE WHEN size(__types) >= {n} THEN"
                f" transform(sequence(1, size(__types) - {n - 1}),"
                f" i -> concat_ws('>', slice(__types, i, {n})))"
                f" ELSE array() END"
            )
        ).alias("path")
    )
    counts = grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = W.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())  # top rows only
    return (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "path", "n_occurrences")
    )


def json_field_profile(
    df: DataFrame,
    json_col: str = "props",
    fields: Sequence[str] = ("k",),
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured payload profiling: extract JSON fields from a
    string column JVM-side (``get_json_object`` — no Python in the
    path) and profile each per group: presence, null rate, integer
    min/max/sum, distinct count. The schema-discovery pass you run
    before promoting a JSON blob column to real columns.

    Scale shape: ONE scan — every field extracts row-locally into an
    array of (field, value) structs that explodes into the single
    |groups|×|fields| aggregate (the r6 union-per-field plan re-read
    the scan once per field; at 100 TB, |fields| extra passes over the
    table for a profiling query is the wrong trade). Extraction is a
    map expression, so predicate pushdown and column pruning on the
    OTHER columns are unaffected; for very wide field lists the next
    step is ``json_tuple`` (one parse for all fields) — per-field
    ``get_json_object`` is kept while |fields| is small because its
    scalar-extraction semantics are the ones the SQL twins mirror.
    All-integer output: hash-exact.

    Output: (group, field, n_rows, n_present, n_distinct, min_v,
    max_v, sum_v).
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(f_name).alias("field"),
                F.get_json_object(F.col(json_col), f"$.{f_name}")
                .cast("long")
                .alias("v"),
            )
            for f_name in fields
        ]
    )
    un = df.select(
        F.col(group_col).alias("grp"), F.explode(pairs).alias("__p")
    ).select("grp", F.col("__p.field").alias("field"), F.col("__p.v").alias("v"))
    return (
        un.groupBy("grp", "field")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_present"),
            F.count_distinct("v").alias("n_distinct"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("v").alias("sum_v"),
        )
        .select(
            F.col("grp").alias(group_col),
            "field", "n_rows", "n_present", "n_distinct",
            "min_v", "max_v", "sum_v",
        )
    )


def pivot_daily_matrix(
    events: DataFrame,
    types: Sequence[str] = ("click", "view", "purchase", "signup", "error"),
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """PIVOT to the wide analytic shape: one row per day, one (count,
    decimal-exact value sum) column pair per event type — the
    spreadsheet/BI export format. Passing the type list explicitly
    keeps it ONE aggregation pass (Spark's pivot without values runs a
    distinct pre-scan first); unknown types are simply absent, exactly
    like the conditional-aggregation SQL it compiles to.

    Scale shape: identical to the tall groupBy — pivot is conditional
    aggregation, map-side partials included; |days| × (2·|types|)
    output. Output: (day_epoch, <type>_n, <type>_sum ...).
    """
    from ..functions import dsum

    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
        * F.lit(86400)
    ).alias("day_epoch")
    aggs = []
    for t in types:
        is_t = F.col(type_col) == t
        aggs.append(
            F.count(F.when(is_t, F.lit(1))).alias(f"{t}_n")
        )
        aggs.append(
            dsum(F.when(is_t, F.col(value_col)), f"{t}_sum")
        )
    return (
        events.select(day, F.col(type_col), F.col(value_col))
        .groupBy("day_epoch")
        .agg(*aggs)
    )


def session_cooccurrence(
    events: DataFrame,
    gap_minutes: int = 30,
    top: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """SESSION CO-OCCURRENCE LIFT: which event-type pairs appear in the
    SAME session more than chance predicts — the market-basket / PMI
    query over behavioral sessions (lift orders identically to PMI;
    PMI = ln lift). For each unordered pair of distinct types,
    lift = P(a,b) / (P(a)·P(b)) over sessions = n_ab·N / (n_a·n_b).

    Exactness: numerator and denominator are DECIMAL(38,0) products;
    only the FINAL division is a double — the collocations convention,
    so both engines divide the same two exactly-represented integers
    and score AND rank are hash-exact.

    Scale shape: ONE user-key window shuffle sessionizes (same
    lag+cumsum composition as session_top_paths); the distinct
    (session, type) relation is bounded by sessions×|type vocabulary|;
    pairs come from each session's sorted distinct-type array (≤
    |vocab|² per session — never a row-level self-join); per-type
    session counts are a |vocab|-row aggregate joined back; N rides a
    broadcast 1-row aggregate.

    Output: (type_a, type_b, n_ab, n_a, n_b, lift), top by
    (lift desc, type_a, type_b) — deterministic.
    """
    from pyspark.sql import Window as W

    w_user = W.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60)
    with_break = events.withColumn(
        "__brk",
        (
            F.coalesce(
                F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w_user)),
                F.lit(None).cast("long"),
            )
            > gap
        ).cast("int"),
    ).withColumn("__sess", F.sum(F.coalesce(F.col("__brk"), F.lit(1))).over(w_user))
    sess_types = (
        with_break.select(user_col, "__sess", F.col(type_col).cast("string").alias("__ty"))
        .distinct()
    )
    n_sessions = (
        sess_types.select(user_col, "__sess")
        .distinct()
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__N"))
    )
    per_type = sess_types.groupBy("__ty").agg(F.count(F.lit(1)).alias("__n_t"))
    type_arrays = sess_types.groupBy(user_col, "__sess").agg(
        F.sort_array(F.collect_set("__ty")).alias("__tys")
    )
    # unordered pairs (i < j) straight off the sorted array — JVM-side
    pair_arr = F.expr(
        "flatten(transform(__tys, (x, i) ->"
        " transform(slice(__tys, i + 2, size(__tys) - i - 1),"
        " y -> struct(x as a, y as b))))"
    )
    pairs = type_arrays.select(F.explode(pair_arr).alias("p")).select("p.a", "p.b")
    n_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    na = per_type.select(F.col("__ty").alias("a"), F.col("__n_t").alias("n_a"))
    nb = per_type.select(F.col("__ty").alias("b"), F.col("__n_t").alias("n_b"))
    scored = (
        n_ab.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            F.col("a").alias("type_a"),
            F.col("b").alias("type_b"),
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab").cast("decimal(38,0)") * F.col("__N")).cast("double")
                / (F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "type_a", "type_b").limit(top)


def ab_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    n_variants: int = 2,
    seed: str = "ab",
    min_conversions: int = 1,
) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test, hash-exact.

    Users are assigned to ``n_variants`` arms by a deterministic md5
    bucket of their id (``functions.hash32`` — the same salt-free
    assignment a real split service computes at the edge, and replayable
    by any engine: no assignment table to join). A user converts if they
    have ≥ ``min_conversions`` ``convert_type`` events (raise it above 1
    for corpora where nearly everyone triggers the event once — a binary
    flag that saturates makes every arm identical and the test
    degenerate). Per arm vs the CONTROL (variant 0):

        pooled p = (x_i + x_0) / (n_i + n_0)
        z_i = (x_i/n_i − x_0/n_0) / sqrt(p·(1−p)·(1/n_i + 1/n_0))

    Every input to the z expression is an exact integer count, and both
    engines evaluate the identical double expression tree — so even the
    z statistic certifies hash-exact (the usual float-drift hazard is
    order-sensitive SUMs, and there are none: just counts).

    Scale shape: ONE user-keyed aggregate (any-conversion flag rides the
    same shuffle as the distinct), then an |arms|-row rollup and a
    broadcast join against the 1-row control. Output: (variant, n_users,
    n_converted, rate, lift_vs_control, z_vs_control), control included
    with lift/z = 0.
    """
    from ..functions import hash32

    # NULL users are not in the experiment: md5(NULL) hashes to a NULL
    # variant, which would otherwise surface as a phantom arm in the
    # readout with a lift/z of its own
    events = events.filter(F.col(user_col).isNotNull())
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.when(
            F.sum(
                F.when(F.col(type_col) == convert_type, F.lit(1)).otherwise(F.lit(0))
            )
            >= min_conversions,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("conv")
    )
    arms = (
        per_user.select(
            (hash32(F.col("u"), seed) % n_variants).cast("int").alias("variant"),
            "conv",
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("conv").cast("long").alias("n_converted"),
        )
        # |variants| rows, materialized ONCE: the empty-control guard
        # below and the final readout both consume this relation — without
        # the checkpoint the guard's collect would re-run the full events
        # scan + per-user aggregate a second time
        .localCheckpoint(eager=True)
    )
    ctl = arms.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n0"), F.col("n_converted").alias("x0")
    )
    # an empty control arm (no user hashed to variant 0) would make the
    # crossJoin below silently return ZERO rows — the readout must fail
    # loudly, not vanish. ctl is at most 1 row of the checkpointed
    # aggregate: the check is a bounded driver read, not a second scan.
    if not ctl.limit(1).collect():
        raise ValueError(
            "ab_test: control arm (variant 0) is empty — no user hashed to "
            "variant 0; use more users or a different seed"
        )
    n, x = F.col("n_users").cast("double"), F.col("n_converted").cast("double")
    n0, x0 = F.col("n0").cast("double"), F.col("x0").cast("double")
    rate = x / n
    rate0 = x0 / n0
    pooled = (x + x0) / (n + n0)
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n + F.lit(1.0) / n0))
    # se == 0 means a degenerate experiment (0% or 100% pooled conversion)
    # — z is undefined there; NULL rather than a division-by-zero under
    # ANSI mode, and NULL is what the SQL twin yields too
    z = (
        F.when(F.col("variant") == 0, F.lit(0.0))
        .when(se == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise((rate - rate0) / se)
    )
    lift = F.when(F.col("variant") == 0, F.lit(0.0)).otherwise(rate - rate0)
    return arms.crossJoin(F.broadcast(ctl)).select(
        "variant",
        "n_users",
        "n_converted",
        rate.alias("rate"),
        lift.alias("lift_vs_control"),
        z.alias("z_vs_control"),
    )


def robust_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_cut: float = 2.5,
) -> DataFrame:
    """Median/MAD daily-volume anomalies — the ROBUST sibling of
    :func:`daily_anomalies`: mean/std z-scores are themselves dragged by
    the outliers they hunt (one huge spike inflates σ and masks the
    rest); the median and the median absolute deviation have a 50%
    breakdown point, so a day is compared against what a TYPICAL day
    looks like.

    Hash-exact: daily counts are integers; the median is an exact type-1
    order statistic (an actual count value — integer); MAD = median of
    |count − median| (integer again); the robust z is ONE fixed double
    expression ``(x − med) / (1.4826 · mad)`` (1.4826 ≈ 1/Φ⁻¹(3/4), the
    normal-consistency constant, a literal). mad = 0 (≥half the days
    identical) → z is NULL: no division, no false fire.

    Scale shape: one (type, day) count shuffle; both medians come from
    (group, value) COUNT relations (the exact_quantiles trick — bounded
    by distinct daily-count values, never days); the per-day join back
    is |types|-keyed broadcast-sized. Output: (event_type, day, n,
    med, mad, z) for |z| ≥ z_cut, plus all mad=0 days excluded.
    """
    from .sketch import exact_quantiles

    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long") * 86400
    ).alias("day_epoch")  # BIGINT epoch day: engine-portable (house convention)
    daily = (
        events.groupBy(F.col(type_col).alias("g"), day)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)  # feeds both medians + the final join
    )
    med = exact_quantiles(daily, "n", "g", qs=(0.5,)).select(
        F.col("g"), F.col("value").alias("med")
    )
    dev = daily.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("n") - F.col("med")).alias("ad")
    )
    mad = exact_quantiles(dev, "ad", "g", qs=(0.5,)).select(
        F.col("g"), F.col("value").alias("mad")
    )
    z = (F.col("n") - F.col("med")).cast("double") / (
        F.lit(1.4826) * F.col("mad").cast("double")
    )
    return (
        daily.join(F.broadcast(med), "g")
        .join(F.broadcast(mad), "g")
        .filter(F.col("mad") > 0)
        .select(
            F.col("g").alias(type_col),
            "day_epoch",
            "n",
            "med",
            "mad",
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) >= z_cut)
    )


def sequence_match(
    events: DataFrame,
    step_a: str = "view",
    step_b: str = "purchase",
    without: str = "error",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern: per user, count ``step_b``
    events preceded by a ``step_a`` with NO ``without`` event between —
    "purchases whose view→purchase path wasn't interrupted by an error",
    the checkout-health / journey-quality question plain funnels can't
    ask (a funnel sees reach, not interruptions).

    Engine-exact without timestamp-tie ambiguity: each user's events get
    a dense SEQUENCE NUMBER (row_number over (ts, id) — a total order),
    and the pattern evaluates on integers: a B at position p matches iff
    ``max(seq of prior A) > coalesce(max(seq of prior C), 0)``. Both
    running maxima are unbounded-preceding window aggregates over the
    SAME user partitioning and order, so the whole operator is ONE
    user-key shuffle with stacked window operators — the funnel plan
    shape.

    Output: (user, n_b, n_matched) for users with ≥1 ``step_b`` event.
    """
    from pyspark.sql import Window as W

    seq_w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    prior = (
        W.partitionBy(user_col)
        .orderBy("__seq")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tagged = events.select(user_col, ts_col, id_col, type_col).withColumn(
        "__seq", F.row_number().over(seq_w).cast("long")
    )
    flagged = tagged.select(
        user_col,
        type_col,
        F.max(F.when(F.col(type_col) == step_a, F.col("__seq"))).over(prior).alias("__la"),
        F.max(F.when(F.col(type_col) == without, F.col("__seq"))).over(prior).alias("__lc"),
    )
    b = flagged.filter(F.col(type_col) == step_b)
    matched = (
        F.col("__la").isNotNull()
        & (F.col("__la") > F.coalesce(F.col("__lc"), F.lit(0)))
    ).cast("int")
    return b.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum(matched).cast("long").alias("n_matched"),
    )


def melt_matrix(
    wide: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """UNPIVOT/melt — the inverse reshape of :func:`pivot_daily_matrix`:
    wide (one column per category) back to tall (one row per category),
    via Spark's native ``unpivot`` (the SQL UNPIVOT/stack shape). The BI
    export comes back into the engine as an analyzable relation.

    Scale shape: map-only — each input row emits |value_cols| rows in
    place; no shuffle, no driver involvement. Mixed value types must be
    cast-compatible (Spark unpivot requires a common type; cast first).
    """
    return wide.unpivot(
        list(id_cols), list(value_cols), var_name, value_name
    )
