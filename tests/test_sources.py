"""Source/sink facade round-trips (the reference has zero I/O — SURVEY
§2.2 scans row; parquet/csv/json/orc are our storage + interchange)."""

import pytest

from shortcut_spark import sources


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmp_path, fmt):
    df = sources.load_fixture(spark, "/root/testdata/sf0.001", "nation")
    out = str(tmp_path / fmt)
    sources.write(df, fmt, out)
    back = sources.read(spark, fmt, out, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_unavailable_connector_fails_clearly(spark):
    with pytest.raises((NotImplementedError, Exception)):
        sources.read(spark, "delta", "/tmp/nope")


def test_fixture_tables_all_load(spark):
    tables = sources.fixture_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == set(sources.FIXTURE_TABLES)
    # events ts must arrive as a usable timestamp despite nanos storage
    from pyspark.sql import types as T

    assert isinstance(tables["events"].schema["ts"].dataType, T.TimestampType)
