"""Arrow-batched scalar Pandas UDFs (the sanctioned Python slow path).

Kept in a module WITHOUT ``from __future__ import annotations``: pandas_udf
resolves the pd.Series type hints at decoration time, and stringified
annotations break that resolution.

These do per-row-pure work, so they stay oracle-checkable; their column-
expression twins live in ``shortcut_spark.functions`` and are what the hot
path should use — the UDFs exist to exercise and document the Arrow UDF
surface (SURVEY §2.2 UDF row).
"""

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.LongType())
def norm_len(s: pd.Series) -> pd.Series:
    """Length of whitespace-normalized text."""
    return s.str.strip().str.replace(r"\s+", " ", regex=True).str.len().astype("int64")


@F.pandas_udf(T.LongType())
def tok_count(s: pd.Series) -> pd.Series:
    """Whitespace token count (twin of functions.token_count)."""
    return s.str.strip().str.split(r"\s+", regex=True).map(len).astype("int64")


@F.pandas_udf(T.LongType())
def qty_sum_udaf(q: pd.Series) -> int:
    """Grouped-aggregate Pandas UDF (UDAF, SURVEY §2.2 UDF row): per-group
    sum of integral quantities, accumulated in int64 so the result is
    order-independent and exactly matches ``SUM(CAST(x AS BIGINT))``.
    A float UDAF would need an exact accumulator (math.fsum / decimal) to
    stay oracle-comparable — integers sidestep that here."""
    return int(q.astype("int64").sum())


@F.pandas_udf(T.LongType())
def count_udaf(q: pd.Series) -> int:
    """Companion UDAF: group size (Spark disallows mixing a grouped-agg
    Pandas UDF with builtin aggregates in one agg(), so the count is a
    UDAF too)."""
    return int(len(q))


@F.udtf(returnType="pos int, bigram string")
class BigramUDTF:
    """Python UDTF (SURVEY §2.2 UDTF row): explodes a text into positioned
    word bigrams. Per-row-pure → exact SQL twin via generate_series/array
    slicing; the hot-path equivalent is the array-expression shingler in
    operators.dedup."""

    def eval(self, text: str):
        toks = text.strip().split()
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"
