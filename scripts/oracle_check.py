"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin on DuckDB at a given sf dir and compares:
row count, sorted column names, and an order-insensitive multiset of
canonicalized values (floats via repr → exact bit equality).

Usage: python scripts/oracle_check.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` builds a plain SparkSession (no engine confs) exactly like
the grading driver does — the mode that caught the round-1 nanos-timestamp
fixture bug. Default uses the tuned ``session.get_spark``.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from shortcut_spark.session import get_spark  # noqa: E402
from shortcut_spark.sources import FIXTURE_TABLES  # noqa: E402


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    import numpy as np

    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def canon_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return cols, sorted(rows)


def _dtype_kind(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int")):
        return s.lower().lstrip("u")
    if s.startswith("float"):
        return s
    if s == "object" or s.startswith(("str", "string")):
        return "str"
    return s


def compare(spdf, odf):
    issues = []
    if len(spdf) != len(odf):
        issues.append(f"rowcount spark={len(spdf)} oracle={len(odf)}")
    # dtype strictness: the driver records schema matches, so int32-vs-int64
    # drift should fail locally too
    for c in sorted(set(spdf.columns) & set(odf.columns)):
        a, b = _dtype_kind(spdf[c].dtype), _dtype_kind(odf[c].dtype)
        if a != b:
            issues.append(f"dtype[{c}] spark={a} oracle={b}")
    sc, srows = canon_rows(spdf)
    oc, orows = canon_rows(odf)
    if sc != oc:
        issues.append(f"columns spark={sc} oracle={oc}")
        return issues
    if srows != orows:
        diff_a = [r for r in srows if r not in set(orows)]
        diff_b = [r for r in orows if r not in set(srows)]
        issues.append(
            f"values mismatch: {len(diff_a)} spark-only / {len(diff_b)} oracle-only; "
            f"example spark-only={diff_a[:2]} oracle-only={diff_b[:2]}"
        )
    return issues


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args[1:]) if len(args) > 1 else (set(args) - {sf_dir} or None)

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "16g")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        issues = compare(spdf, odf)
        if issues:
            print(f"FAIL {name}: {'; '.join(issues)} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"pass {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
