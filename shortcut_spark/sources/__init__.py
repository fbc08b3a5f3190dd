"""Source/sink registry.

The reference has no I/O at all (zero deps, in-memory only — Cargo.toml:23-24,
SURVEY §2.2); parquet IS our storage layer, and the rest of Spark's
connector surface comes along for free. This module is a thin, uniform
facade so engine code and tests never hand-roll reader options, plus
import-try-gated stubs for connectors whose jars aren't in this container.
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read",
    "write",
    "write_bucketed",
    "load_fixture",
    "fixture_tables",
    "normalize_event_ts",
    "FIXTURE_TABLES",
]

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema=None,
    splittable: bool = False,
    **options,
) -> DataFrame:
    """Uniform reader facade over Spark's sources.

    CSV caveat (foreign files): the CSV defaults here are LOSSLESS
    ROUND-TRIP defaults paired with :func:`write` — ``multiLine=true``
    (quoted embedded newlines parse as one row), ``nullValue="\\N"`` and
    ``emptyValue=""`` (so NULL and empty string survive distinctly).
    They intentionally differ from Spark's own defaults, so CSVs NOT
    produced by :func:`write` shift semantics: an empty field parses as
    ``''`` instead of NULL, a literal ``\\N`` field becomes NULL, and
    ``multiLine`` makes the scan single-task. Reading third-party CSVs,
    pass ``multiLine="false"``/``nullValue=""`` explicitly (or
    ``splittable=True``, below) to get interchange-standard behavior.

    ``splittable=True`` is the BULK-INGEST preset for CSV: turns
    ``multiLine`` off so the scan splits by line across tasks (a
    multiLine read is one task per file — fine for interchange, fatal
    for a 100 TB ingest). Only safe when the data has no embedded
    newlines; pair it with ``write(..., assert_no_newlines=True)``,
    which refuses to produce files this preset would mis-split. The
    ``\\N``/empty-string sentinels stay on (they are per-field and do
    not affect splittability).
    """
    fmt = fmt.lower()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.options(**options).parquet(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    if fmt == "csv":
        options.setdefault("header", "true")
        # LOSSLESS round-trip defaults, paired with write()'s (r8 hostile-
        # string sweep: embedded newlines split rows, empty string read
        # back as NULL, writer trimmed padding):
        # - multiLine: fields the writer quoted for embedded newlines
        #   parse as one row. Scale caveat: a multiLine CSV read is NOT
        #   splittable — use splittable=True (or pass multiLine="false")
        #   for splittable scans of newline-free data, or use parquet/ORC
        #   (CSV is the interchange tier here, not the scan tier).
        # - nullValue "\\N" (the classic Hive/MySQL sentinel): frees the
        #   empty field to mean EMPTY STRING (emptyValue), so '' and NULL
        #   survive distinctly.
        options.setdefault("multiLine", "false" if splittable else "true")
        options.setdefault("nullValue", "\\N")
        options.setdefault("emptyValue", "")
        return reader.options(**options).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt in ("jdbc", "delta", "iceberg", "avro"):
        # these need jars not present in this container; fail clearly
        try:
            return reader.format(fmt).options(path=path, **options).load()
        except Exception as e:  # pragma: no cover - environment dependent
            raise NotImplementedError(
                f"{fmt} connector jars are not available in this environment"
            ) from e
    raise ValueError(f"unknown format {fmt!r}")


def write(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    assert_no_newlines: bool = False,
    **options,
) -> None:
    """Uniform writer facade; CSV defaults pair with :func:`read` for a
    lossless round-trip (padding preserved, NULL as ``\\N``).

    ``assert_no_newlines=True`` (CSV only) is the write half of the
    splittable-CSV contract: before writing, scan the string columns for
    embedded ``\\n``/``\\r`` and raise ``ValueError`` if any row has one —
    guaranteeing the produced files are safe for
    ``read(..., splittable=True)``'s line-split scan. Costs one extra
    pass over the string columns (column-pruned, map-only); skip it for
    interchange-tier writes where the multiLine reader handles quoting.
    """
    fmt = fmt.lower()
    if fmt == "csv":
        if assert_no_newlines:
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            str_cols = [
                f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
            ]
            if str_cols:
                bad = F.lit(False)
                for c in str_cols:
                    bad = bad | F.col(c).contains("\n") | F.col(c).contains("\r")
                offender = df.filter(bad).select(*str_cols).head(1)
                if offender:
                    raise ValueError(
                        "assert_no_newlines: embedded newline in string column(s) "
                        f"{str_cols} (first offending row: {offender[0].asDict()!r}); "
                        "these rows would mis-split under read(splittable=True) — "
                        "clean them (e.g. regexp_replace) or write without the assert"
                    )
        # paired with read()'s lossless defaults (caller options win):
        # preserve padding (the writer's univocity defaults TRIM both
        # ends) and write NULL as the \N sentinel so the reader can tell
        # it from empty string
        options.setdefault("header", "true")
        options.setdefault("ignoreLeadingWhiteSpace", "false")
        options.setdefault("ignoreTrailingWhiteSpace", "false")
        options.setdefault("nullValue", "\\N")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        writer.csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unknown sink format {fmt!r}")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and bucket-sorted) table write — the co-located join
    layout. Two tables bucketed on the same key with the same bucket count
    join with ZERO shuffle exchanges (asserted in tests/test_plans.py):
    at 100 TB this is how repeated fact-fact joins amortize their shuffle
    into one write-time organization. ``path`` makes the table external
    (data at ``path``, only metadata in the catalog); bucketing requires
    the catalog, so this is ``saveAsTable``, not a bare file write."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Events ``ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    versions surface differently: as long nanos (older Spark, via the
    legacy ``nanosAsLong`` conf) or natively as TIMESTAMP_NTZ (Spark 4.1+).
    Normalize both to a TIMESTAMP (``timestamp_ltz``) — the type
    ``withWatermark`` requires — whose epoch equals the stored wall time
    read as UTC, exactly what DuckDB computes for naive parquet
    timestamps. A bare NTZ→LTZ cast interprets the wall time in the
    session timezone, so it is wrapped in ``from_utc_timestamp(…,
    current_timezone())`` which undoes that interpretation. The round
    trip is exact under any FIXED-OFFSET session timezone (the engine
    pins UTC, session.py); under a DST zone the cast and the unwrap can
    resolve ambiguous/skipped wall times near transitions to different
    offsets and be off by the DST delta — hence the pin is a correctness
    requirement, not a convenience."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(
            col,
            F.from_utc_timestamp(
                F.col(col).cast(T.TimestampType()), F.current_timezone()
            ),
        )
    return df


def load_fixture(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """One driver fixture table (TESTDATA.md layout).

    Self-sufficient under ANY SparkSession: events.parquet carries
    TIMESTAMP(NANOS), whose handling has drifted across Spark versions —
    Spark 4.1+ reads it natively as TIMESTAMP_NTZ; older Spark refuses
    (PARQUET_TYPE_ILLEGAL) unless the legacy nanos-as-long conf is set.
    Try the plain read first, fall back to the conf, then to a pyarrow
    rewrite-to-micros; ``normalize_event_ts`` maps every surface form to
    the same watermark-compatible TIMESTAMP."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table != "events":
        return spark.read.parquet(path)
    try:
        df = spark.read.parquet(path)
    except Exception:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        except Exception:
            df = _load_nanos_via_pyarrow(spark, path)
    return normalize_event_ts(df)


def _load_nanos_via_pyarrow(spark: SparkSession, path: str) -> DataFrame:
    """Last-resort loader: read the file with pyarrow, truncate nanos
    timestamps to micros, and hand Spark an Arrow-backed DataFrame. Only
    reached when the legacy conf is rejected, so it is a small-fixture
    escape hatch, not a scale path."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    import pyarrow.compute as pc

    tbl = papq.read_table(path)
    cols = []
    for f, col in zip(tbl.schema, tbl.columns):
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            # truncating (floor) cast — matches `ts div 1000` in
            # normalize_event_ts and DuckDB's nanos handling
            col = pc.cast(col, pa.timestamp("us"), safe=False)
        cols.append(col)
    tbl = pa.table(cols, names=tbl.column_names)
    return spark.createDataFrame(tbl.to_pandas())


def fixture_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_fixture(spark, sf_dir, t) for t in FIXTURE_TABLES}
