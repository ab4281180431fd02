#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the
sf_dir tables, and compares values (column-name-sorted, row-sorted).
"""
import json, re, sys, glob, os
import duckdb
import pandas as pd


def _dtype_key(s: str) -> str:
    """Normalize a pandas dtype string for the strict compare.

    Tolerated representation differences (each driver-verified):
    - datetime64 storage unit (ns vs us vs ms): a parquet/pandas
      storage artifact, not an engine result type; the driver's hash
      is value-level for timestamps.
    - integer WIDTH (int32 vs int64): Spark row_number() is int32,
      DuckDB's is BIGINT, and q7_window_rank hash-PASSed the driver
      in rounds 1-4 — the driver normalizes integer values.
    Everything else must match exactly — in particular DuckDB HUGEINT
    (integer sum()) surfaces as float64 or decimal while Spark emits
    int64, and the driver's hash FAILS on that (pipeline_curate
    r2-r4); the local gate must too (r4 verdict items 1-3). int-vs-
    float is NOT normalized.
    """
    s = re.sub(r"^u?int(8|16|32|64)$", "int64", s)
    return re.sub(r"^datetime64\[(ns|us|ms)", "datetime64[*", s)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types a bit
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        dt_mismatch = [
            (c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
            if _dtype_key(str(got[c].dtype)) != _dtype_key(str(want[c].dtype))]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle) {dt_mismatch}"
                  " — DuckDB HUGEINT from integer sum()? CAST(... AS BIGINT)"
                  " in the oracle SQL")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
