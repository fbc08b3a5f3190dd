"""Environment-drift canary.

The events fixture stores parquet TIMESTAMP(NANOS), and how Spark surfaces
that type has already changed once between container Spark upgrades
(PARQUET_TYPE_ILLEGAL → long-nanos-via-legacy-conf → native TIMESTAMP_NTZ).
Each drift silently broke every ``withWatermark`` path. This test builds a
TRULY vanilla SparkSession in a subprocess (no engine confs, no conftest
session) and asserts the loaded fixture's ``ts`` is watermark-compatible on
a real streaming relation — the exact surface that went red in rounds 1
and 2. If the next Spark upgrade changes the nanos story again, this fails
first and points at ``sources.normalize_event_ts``.
"""

import pytest
import subprocess
import sys
import textwrap

CANARY = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("env_canary")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from shortcut_spark.sources import load_fixture
    from shortcut_spark.streaming import _file_stream

    ev = load_fixture(spark, "/root/testdata/sf0.001", "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
        "batch ts must be TIMESTAMP (LTZ), got %s" % ev.schema["ts"].dataType
    )
    assert ev.count() > 0

    # the real gate: withWatermark on a STREAMING relation type-checks
    # eagerly — this is the line that threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # when Spark 4.1 started reading nanos parquet as TIMESTAMP_NTZ
    stream = _file_stream(spark, "/root/testdata/sf0.001/events.parquet")
    stream.withWatermark("ts", "1 hour")
    print("CANARY_OK")
    spark.stop()
    """
)


@pytest.mark.slow
def test_vanilla_session_events_watermark_compatible():
    proc = subprocess.run(
        [sys.executable, "-c", CANARY],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"canary failed:\n{proc.stdout}\n{proc.stderr}"
    assert "CANARY_OK" in proc.stdout
