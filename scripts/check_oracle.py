"""Local replica of the driver's correctness gate: runs every
queries() entry and its oracle_sql() side-by-side, compares row count,
column names, and (sorted, rounded) values. Usage:

    python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr distinguishes -0.0 from 0.0, like the driver's value
        # hash does (plain == would forgive the sign)
        return repr(round(v, 9))
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-wrap for the sort: tuples with None/mixed types aren't
    # orderable in Python, and repr equality is what matters
    return sorted(
        tuple(repr(norm_cell(r[i])) for i in order) for r in rows)


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (no oracle,"
                  " rows-only check)")
            if len(srows) == 0 and name != "dedup_exact":
                print(f"     WARNING {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if sorted(c.lower() for c in scols) != sorted(
                c.lower() for c in ocols):
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(
                (name, f"rowcount {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        sn = norm_rows(scols, srows)
        on = norm_rows(ocols, orows)
        if sn != on:
            diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diffs}"))
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            continue
        print(f"ok   {name}: rows={len(srows)} values match")

    print(f"\n{len(failures)} failures"
          + (f": {[f[0] for f in failures]}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
