#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run each oracle_sql in DuckDB
over the same sf dir and diff against the Verify.scala parquet dumps.
Usage: python3 dev/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            # keep exact: int64 -> float64 would mask diffs below ~128 ulp
            # in 60-bit hash columns (values >> 2^53)
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            failed.append(name)
            continue
        try:
            mine = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failed.append(name)
            continue
        if list(oracle.columns) != list(mine.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(oracle.columns)}")
            failed.append(name)
            continue
        if len(oracle) != len(mine):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(oracle)}")
            failed.append(name)
            continue
        if not oracle.equals(mine):
            neq = (oracle != mine) & ~(oracle.isna() & mine.isna())
            bad_cols = [c for c in oracle.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value diff in {bad_cols}; first row {i}:")
            print("  mine  :", mine.iloc[i].to_dict())
            print("  oracle:", oracle.iloc[i].to_dict())
            failed.append(name)
            continue
        print(f"OK   {name} ({len(mine)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
