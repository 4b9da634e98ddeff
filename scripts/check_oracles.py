"""Local simulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the same
sf_dir, compare row count, column names, and exact sorted values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pdfparser_spark.session import build_session  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(norm(v) for v in r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only (no oracle), {len(rows)} rows")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        scols = [c.lower() for c in cols]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            failures += 1
            continue
        # align column order by name (driver sorts columns by name)
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        # repr sort key: total order even with NULLs / mixed types
        srows = sorted((tuple(r[i] for i in sidx) for r in rows), key=repr)
        orows2 = sorted((tuple(r[i] for i in oidx) for r in orows), key=repr)
        if len(srows) != len(orows2):
            print(f"FAIL {name}: row count {len(srows)} vs {len(orows2)}")
            failures += 1
        elif srows != orows2:
            bad = sum(1 for a, b in zip(srows, orows2) if a != b)
            print(f"FAIL {name}: {bad}/{len(srows)} value mismatches")
            for a, b in zip(srows, orows2):
                if a != b:
                    print(f"   spark:  {a}")
                    print(f"   duckdb: {b}")
                    break
            failures += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
