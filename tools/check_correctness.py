#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare row counts, schemas (loosely), and values (exact for ints/strings,
tiny tolerance reported for floats so we can see if exactness holds).

Usage: python3 tools/check_correctness.py [sfdir] [outdir] [--no-run]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit("verify run failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)


def canon(df):
    # sort columns by name, then rows by all columns (mimics driver compare)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    issues = []
    if list(sorted(spark_df.columns)) != list(sorted(oracle_df.columns)):
        return [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    if len(spark_df) != len(oracle_df):
        issues.append(f"row count spark={len(spark_df)} oracle={len(oracle_df)}")
        return issues
    a, b = canon(spark_df), canon(oracle_df)
    for col in a.columns:
        x, y = a[col], b[col]
        if x.dtype.kind in "fc" or y.dtype.kind in "fc":
            xx = pd.to_numeric(x, errors="coerce")
            yy = pd.to_numeric(y, errors="coerce")
            neq = ~((xx == yy) | (xx.isna() & yy.isna()))
            if neq.any():
                i = neq.idxmax()
                mx = (xx - yy).abs().max()
                issues.append(f"col {col}: {int(neq.sum())} exact-mismatches, max abs diff {mx} (e.g. row {i}: {xx[i]} vs {yy[i]})")
        else:
            xs, ys = x.astype(str), y.astype(str)
            neq = ~(xs == ys)
            if neq.any():
                i = neq.idxmax()
                issues.append(f"col {col} ({x.dtype} vs {y.dtype}): {int(neq.sum())} mismatches (e.g. row {i}: {xs[i]!r} vs {ys[i]!r})")
    # dtype visibility (informational)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            issues.append(f"NOTE dtype {col}: spark={a[col].dtype} oracle={b[col].dtype}")
    return issues


def main():
    if "--no-run" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    ok = fail = 0
    for name in sorted(oracle):
        d = OUT / name
        if not d.exists():
            print(f"FAIL {name}: no spark output written"); fail += 1; continue
        spark_df = duckdb.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
        issues = compare(name, spark_df, oracle_df)
        real = [i for i in issues if not i.startswith("NOTE")]
        notes = [i for i in issues if i.startswith("NOTE")]
        if real:
            fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows)")
            for i in issues:
                print(f"   {i}")
        else:
            ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)" + (f"  [{'; '.join(notes)}]" if notes else ""))
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
