"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the DuckDB oracle on the same parquet dir; compares row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified with float rounding). Usage:

    python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6).astype(str)
        else:
            df[c] = df[c].astype(str)
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from transcript_dedup.session import get_spark

    spark = get_spark("driver-sim", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check), cols={list(sdf.columns)}")
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(ddf)} cols_ok={ok_cols} hash_ok={ok_hash}"
        )
        if not ok_hash and ok_cols and len(sdf) == len(ddf) and len(sdf) > 0:
            s = sdf[sorted(sdf.columns)].astype(str).sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
            d = ddf[sorted(ddf.columns)].astype(str).sort_values(list(sorted(ddf.columns))).reset_index(drop=True)
            diff = (s != d).any(axis=1)
            if diff.any():
                i = diff.idxmax()
                print("   spark:", s.iloc[i].to_dict())
                print("   duck :", d.iloc[i].to_dict())
    spark.stop()
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
