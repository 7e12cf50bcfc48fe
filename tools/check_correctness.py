"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, sorted column names,
and order-insensitive cell values (exact equality after canonicalization —
stricter than the driver's value hash, so passing here implies passing
there for any reasonable hash).

Usage: python tools/check_correctness.py [--tz ZONE] [sf_dir] [query ...]

``--tz Asia/Tokyo`` runs the Spark side in a non-UTC session — the
driver builds its own SparkSession, so timezone assumptions baked into
the repo session factory (UTC pinning) must not be load-bearing; every
timestamp-touching query should pass under any zone (NTZ literals,
timestampdiff, tz-free date truncation).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_frame(pdf):
    # column-wise extraction — iterrows() would upcast mixed int/float rows
    cols = sorted(pdf.columns)
    series = [pdf[c].tolist() for c in cols]
    rows = [tuple(canon_cell(v) for v in row) for row in zip(*series)] if cols else []
    return cols, sorted(rows)


def main() -> int:
    args = sys.argv[1:]
    tz = None
    if "--tz" in args:
        i = args.index("--tz")
        tz = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from nemsis_xml_parser_spark.session import get_spark

    spark = get_spark("check_correctness")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passes, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if tz:
            # re-apply per query: a query (or table()) that touches the
            # session zone must not silently un-tz the rest of the sweep
            spark.conf.set("spark.sql.session.timeZone", tz)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"ROWS-ONLY {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        scols, srows = canon_frame(sdf)
        ocols, orows = canon_frame(odf)
        msg = None
        if scols != ocols:
            msg = f"schema: spark={scols} duck={ocols}"
        elif len(srows) != len(orows):
            msg = f"rowcount: spark={len(srows)} duck={len(orows)}"
        elif srows != orows:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            ][:3]
            msg = f"values differ, first diffs: {diffs}"
        if msg:
            failures.append((name, msg))
            print(f"FAIL {name}: {msg}")
        else:
            passes.append(name)
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")

    print(
        f"\n=== {len(passes)} pass, {len(failures)} fail, "
        f"{len(rows_only)} rows-only (of {len(qs)} total) ==="
    )
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
