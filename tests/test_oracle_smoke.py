"""Oracle smoke inside pytest: a representative subset of the driver's
correctness gate at sf0.001 so `pytest` alone catches oracle drift.
The full gate is scripts/oracle_check.py."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from scripts.oracle_check import compare
from shortcut_spark.sources import FIXTURE_TABLES

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "above_avg_customers",
    "store_find_eq",
    "dedup_exact",
    "text_quality",
    "embed_topk",
    "events_sessionize",
    "asof_latest_order",
    "corpus_clean",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_subset(spark, duck, name):
    spdf = entry_mod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).df()
    issues = compare(spdf, odf)
    assert not issues, issues


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
