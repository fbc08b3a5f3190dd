"""Declarative data-quality constraint checks — the validation gate a
100 TB ingest pipeline runs before promoting a batch (the Deequ/
dbt-test shape, re-expressed as one Spark aggregate).

Every rule compiles to an AGGREGATE EXPRESSION over the table; ``check``
evaluates all rules in ONE pass (a single ``df.agg`` — one scan, partial
map-side aggregation, a 1-row result) and then unpivots that row into one
(check, col_name, metric, expected, passed) row per rule. Nothing here is
per-row Python: metrics are built-in JVM aggregates, so the pass is
whole-stage-codegen'd and column-pruned to exactly the referenced columns.

The reference engine has no validation surface (it has no aggregates at
all — client-side iteration only, ``src/lib.rs:255``); this is extension
tier. All metrics are exact, so the whole report is oracle-checkable
bit-for-bit (driver query ``data_checks``).

Scale notes: multiple ``count_distinct`` aggregates in one pass expand the
input (Spark's Expand operator: one duplicated stream per distinct
aggregate). Rule sets with many ``unique`` checks should either accept the
expand factor (it is map-side and pipelined) or split uniques into a
second pass; the single-``unique`` common case costs one expand branch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "Rule",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "matches",
    "min_rows",
    "satisfies",
    "references",
    "check",
]


class Rule:
    """One constraint: a named aggregate metric plus a pass predicate.

    ``metric`` is an aggregate Column producing a DOUBLE; ``passed`` is a
    plain (non-aggregate) predicate over that metric value; ``expected``
    is the human-readable threshold printed in the report.
    """

    def __init__(self, check: str, col_name: str, metric: Column, passed, expected: str):
        self.check = check
        self.col_name = col_name
        self.metric = metric.cast("double")
        self.passed = passed
        self.expected = expected


def not_null(col: str, min_fraction: float = 1.0) -> Rule:
    """Completeness: fraction of non-null values ≥ ``min_fraction``."""
    frac = F.count(F.col(col)) / F.count(F.lit(1))
    return Rule(
        "not_null", col, frac, lambda m: m >= F.lit(min_fraction), f">= {min_fraction}"
    )


def unique(col: str) -> Rule:
    """Uniqueness: exact distinct count equals row count (a key check)."""
    ratio = F.count_distinct(F.col(col)) / F.count(F.lit(1))
    return Rule("unique", col, ratio, lambda m: m == F.lit(1.0), "== 1.0")


def in_range(col: str, lo=None, hi=None) -> Rule:
    """Bounds: fraction of (non-null) values inside [lo, hi] must be 1.
    Open ends allowed (lo/hi None). Nulls are not range violations —
    pair with :func:`not_null` to forbid them."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    ok = F.sum(F.when(F.col(col).isNull() | cond, 1).otherwise(0))
    frac = ok / F.count(F.lit(1))
    return Rule(
        "in_range", col, frac, lambda m: m == F.lit(1.0), f"in [{lo}, {hi}]"
    )


def accepted_values(col: str, values: Sequence) -> Rule:
    """Domain: every non-null value is one of ``values``."""
    ok = F.sum(F.when(F.col(col).isNull() | F.col(col).isin(list(values)), 1).otherwise(0))
    frac = ok / F.count(F.lit(1))
    return Rule(
        "accepted_values", col, frac, lambda m: m == F.lit(1.0), f"in {sorted(values)}"
    )


def matches(col: str, pattern: str, min_fraction: float = 1.0) -> Rule:
    """Format: fraction of non-null values matching ``pattern`` (Java
    regex, unanchored ``rlike`` semantics) ≥ ``min_fraction``. Keep
    patterns in the engine-portable subset if the report must be
    oracle-compared."""
    ok = F.sum(F.when(F.col(col).isNull() | F.col(col).rlike(pattern), 1).otherwise(0))
    frac = ok / F.count(F.lit(1))
    return Rule(
        "matches", col, frac, lambda m: m >= F.lit(min_fraction), f">= {min_fraction}"
    )


def min_rows(n: int) -> Rule:
    """Volume: the batch has at least ``n`` rows (empty-upstream guard)."""
    return Rule("min_rows", "*", F.count(F.lit(1)), lambda m: m >= F.lit(float(n)), f">= {n}")


def satisfies(predicate: str | Column, name: str, min_fraction: float = 1.0) -> Rule:
    """Cross-column consistency: fraction of rows satisfying an arbitrary
    row-level boolean ``predicate`` (SQL string or Column — e.g.
    ``"start_ts <= end_ts"`` or ``"price * qty = total"``) must be ≥
    ``min_fraction``. The generic escape hatch for constraints the typed
    rules can't express; NULL predicate results count as violations (SQL
    three-valued logic: an unprovable constraint is not a satisfied one).
    """
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    frac = F.sum(F.when(cond, 1).otherwise(0)) / F.count(F.lit(1))
    return Rule(
        "satisfies", name, frac, lambda m: m >= F.lit(min_fraction), f">= {min_fraction}"
    )


def references(col: str, dim: DataFrame, dim_col: str, dim_name: str = "") -> Rule:
    """Referential integrity: every non-null ``col`` value exists in the
    dimension's ``dim_col`` key set (the Deequ isContainedIn-other-table
    shape — the one constraint a single-table aggregate cannot express).

    Compiled as a PREPARE step: the dimension's distinct keys left-join
    onto the fact table (a marker column; the planner broadcasts small
    key sets itself), and the rule's
    metric is then an ordinary aggregate over that marker — so the report
    still runs as ONE pass over the fact table, with the key set attached
    map-side. At 100 TB the fanout is zero (keys are distinct) and a
    too-big-to-broadcast dimension degrades to a shuffle join on the FK,
    which is the honest cost of checking it."""
    # marker must be unique per RULE: dim_name (which also distinguishes
    # the rules in check()'s dedup key) joins the suffix so two dimensions
    # that happen to share a key-column name cannot collide
    import hashlib

    suffix = (
        "_" + hashlib.md5(dim_name.encode()).hexdigest()[:6] if dim_name else ""
    )
    marker = f"__ref_{col}_{dim_col}{suffix}"

    def prepare(df: DataFrame) -> DataFrame:
        keys = (
            dim.select(F.col(dim_col).alias(col))
            .distinct()
            .withColumn(marker, F.lit(1))
        )
        # no forced broadcast hint: small key sets broadcast via the
        # planner's threshold/AQE; a too-big dimension genuinely degrades
        # to the shuffle join the docstring promises
        return df.join(keys, col, "left")

    ok = F.sum(F.when(F.col(col).isNull() | F.col(marker).isNotNull(), 1).otherwise(0))
    frac = ok / F.count(F.lit(1))
    rule = Rule(
        "references",
        col,
        frac,
        lambda m: m == F.lit(1.0),
        f"in {dim_name or dim_col}",
    )
    rule.prepare = prepare
    return rule


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all ``rules`` against ``df`` in ONE aggregate pass.

    Output: one row per rule — (check, col_name, metric double,
    expected string, passed boolean) — the report a pipeline gates a
    batch promotion on (``passed`` all true) and ships to its data-quality
    dashboard. Rule order is not significant (the report is a set).

    Rules may carry a ``prepare`` hook (see :func:`references`) that
    attaches derived columns before the aggregate — the pass count over
    the fact table stays one.
    """
    if not rules:
        raise ValueError("check() needs at least one rule")
    for r in rules:
        prep = getattr(r, "prepare", None)
        if prep is not None:
            df = prep(df)
    names = {}
    for r in rules:
        # expected joins the key so two references() rules on one fact
        # column against DIFFERENT dimensions are both admissible
        key = (r.check, r.col_name, r.expected)
        if key in names:
            raise ValueError(f"duplicate rule {r.check} on {r.col_name!r}")
        names[key] = r
    one = df.agg(
        *[r.metric.alias(f"__m{i}") for i, r in enumerate(rules)]
    )
    reports = F.array(
        *[
            F.struct(
                # "check" is a reserved word in most SQL dialects — name the
                # report column check_name so downstream SQL (and the DuckDB
                # oracle twin) never needs quoting
                F.lit(r.check).alias("check_name"),
                F.lit(r.col_name).alias("col_name"),
                F.col(f"__m{i}").alias("metric"),
                F.lit(r.expected).alias("expected"),
                r.passed(F.col(f"__m{i}")).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return one.select(F.explode(reports).alias("r")).select(
        "r.check_name",
        "r.col_name",
        F.round(F.col("r.metric"), 8).alias("metric"),
        "r.expected",
        "r.passed",
    )
