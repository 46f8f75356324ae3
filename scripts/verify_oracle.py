"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count, sorted column names, and
order-insensitive values.

Usage: python scripts/verify_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as mod

    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        status = "OK"
        if list(a.columns) != list(b.columns):
            status = f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
                )
            except AssertionError as exc:
                status = f"VALUE MISMATCH: {str(exc)[:400]}"
            else:
                # The driver's comparison hashes rendered values, so an
                # integer column that DuckDB returns as HUGEINT (pandas
                # float64: 655.0 vs 655) fails its gate even when every
                # value is numerically equal (round-3 regression). Flag
                # numeric-kind drift between the two frames.
                drift = [
                    c
                    for c in a.columns
                    if a[c].dtype.kind != b[c].dtype.kind
                    and {a[c].dtype.kind, b[c].dtype.kind} <= {"i", "u", "f"}
                ]
                if drift:
                    status = "DTYPE DRIFT " + ", ".join(
                        f"{c}: spark={a[c].dtype} duck={b[c].dtype}" for c in drift
                    )
        print(f"  {name}: {status} ({len(a)} rows) [{time.time()-t0:.1f}s]")
        if status != "OK":
            failed.append(name)
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
