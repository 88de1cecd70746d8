#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/local_check.py [verify_out_dir] [sf_dir] [query ...]

Assumes `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` already ran.
Loads each <verify_out_dir>/<name> parquet (Spark result), runs the oracle
SQL from oracle_sql.json in DuckDB against the sf parquet tables, and
compares: schema (column names), row count, and exact cell equality after
sorting columns by name and rows by all columns. Stricter than any hash
compare — if this passes, the driver's gate passes.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            files = glob.glob(f"{spark_path}/*.parquet")
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue

        # array-column gate (the r8 q_embed_pca class): the DRIVER sorts raw
        # values and crashes on unhashable numpy arrays; local str-casting
        # would mask it. Any array/list-valued cell in the Spark output is
        # a FAIL — serialize it (concat_ws / md5) in the query surface.
        # scan the WHOLE column, not iloc[0]: a nullable array column whose
        # first row is None would slip past a head-only probe and still
        # crash the driver's sort on its non-null rows
        arr_cols = [c for c in spark_df.columns
                    if spark_df[c].dtype == object and len(spark_df) > 0
                    and any(isinstance(v, (np.ndarray, list))
                            for v in spark_df[c])]
        if arr_cols:
            print(f"FAIL {name}: unserialized array column(s) "
                  f"{arr_cols} (driver sort WILL crash)")
            n_fail += 1
            continue

        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        # dtype-FAMILY gate (the r8 HUGEINT class): the driver hashes value
        # representations, so DuckDB HUGEINT -> pandas float64 `0.0` vs
        # Spark BIGINT `0` hash-mismatches even though the cells compare
        # equal. Mirror that strictness here: an int-vs-float family split
        # between the two sides is a FAIL (fix the oracle with CAST(... AS
        # BIGINT) around sum(CASE...)/sum(int) columns).
        fam_bad = []
        for c in s.columns:
            sf_ = ("int" if np.issubdtype(s[c].dtype, np.integer)
                   else "float" if np.issubdtype(s[c].dtype, np.floating)
                   else "other")
            df_ = ("int" if np.issubdtype(d[c].dtype, np.integer)
                   else "float" if np.issubdtype(d[c].dtype, np.floating)
                   else "other")
            if {sf_, df_} == {"int", "float"}:
                fam_bad.append(f"{c}: spark={s[c].dtype} duck={d[c].dtype}")
        if fam_bad:
            print(f"FAIL {name}: dtype family mismatch (HUGEINT class — "
                  f"driver hash WILL fail): " + "; ".join(fam_bad))
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                sv = np.asarray(sv, dtype=np.float64)
                dv = np.asarray(dv, dtype=np.float64)
                neq = ~((sv == dv) | (np.isnan(sv) & np.isnan(dv)))
                if neq.any():
                    i = int(np.argmax(neq))
                    bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: {sv[i]!r} vs {dv[i]!r} (maxabs={np.nanmax(np.abs(sv-dv)):.3e})")
            else:
                neq = ~(pd.Series(sv).eq(pd.Series(dv)) | (pd.Series(sv).isna() & pd.Series(dv).isna()))
                if neq.any():
                    i = int(np.argmax(neq.values))
                    bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: {sv[i]!r} vs {dv[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracles)} total oracles")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
