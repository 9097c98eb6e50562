"""Simulate the driver's correctness gate: run every __spark_entry__
query on Spark and its DuckDB oracle side-by-side at a given sf, and
compare row counts, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [--json OUT] [sf_dir] [query ...]

``--json OUT`` additionally writes per-query results in the driver's
CORRECTNESS format (rows/schema/hash match flags + row counts + err)
— the round-end full-registry artifact (CORRECTNESS_full_rN.json).
"""

from __future__ import annotations

import json
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from coies_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if fx != fy:
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
            elif str(x) != str(y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {str(e)[:300]}",
            }
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            ok0 = len(sdf) > 0 or name == "noop"
            if not ok0:
                failures.append((name, "0 rows"))
            results[name] = {
                "rows_match": ok0, "schema_match": None,
                "hash_match": None, "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": None if ok0 else "0 rows (rows-only)",
            }
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"oracle: {str(e)[:300]}",
            }
            continue
        ok, why = values_match(normalize(sdf), normalize(odf))
        status = "match" if ok else "FAIL "
        print(f"{status} {name}: spark={len(sdf)} oracle={len(odf)} {why}")
        if not ok:
            failures.append((name, why))
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": ok,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": None if ok else why[:300],
        }
    print(f"\n{len(failures)} failures")
    for n, w in failures:
        print(f"  {n}: {w}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
