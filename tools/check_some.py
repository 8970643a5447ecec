#!/usr/bin/env python3
"""Focused replica of check_correctness.py: verify ONLY the named queries
against the DuckDB oracle (fast iteration during optimization rounds; the
full gate stays tools/check_correctness.py).

Usage: python3 tools/check_some.py q98_entity_delta,q107_er_delta_multiblock \
           [sfdir] [outdir] [--no-run]
"""
import json, subprocess, sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
import check_correctness as cc

NAMES = sys.argv[1].split(",")
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_some")


def main():
    if "--no-run" not in sys.argv:
        cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {",".join(NAMES)}']
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-2000:])
            sys.exit("verify run failed")
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)
    con = duckdb.connect()
    for t in cc.TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    ok = fail = 0
    for name in NAMES:
        d = OUT / name
        if not d.exists():
            print(f"FAIL {name}: no spark output written"); fail += 1; continue
        spark_df = duckdb.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
        issues = cc.compare(name, spark_df, oracle_df)
        real = [i for i in issues if not i.startswith("NOTE")]
        if real:
            fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows)")
            for i in issues:
                print(f"   {i}")
        else:
            ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
