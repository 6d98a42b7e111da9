#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via
sbt, then compare each dumped parquet against its DuckDB oracle on the
same testdata. Sort columns by name, sort rows, exact-compare values.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [name...]
"""
import sys, os, json, subprocess

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
args = sys.argv[3:]
skip = "--skip-verify" in args
only = [a for a in args if not a.startswith("--")]

if not skip:
    names_arg = (" " + " ".join(only)) if only else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}{names_arg}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
names = only or sorted(oracle.keys())
for name in names:
    sql = oracle.get(name)
    if sql is None:
        print(f"  ?    {name}: no oracle (rows-only)")
        continue
    try:
        mine = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f" FAIL  {name}: {e}"); continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        fails.append(name)
        print(f" FAIL  {name}: cols {list(mine.columns)} vs {list(ref.columns)}")
        continue
    if len(mine) != len(ref):
        fails.append(name)
        print(f" FAIL  {name}: rows {len(mine)} vs {len(ref)}")
        continue
    a = mine.sort_values(by=list(mine.columns), ignore_index=True)
    b = ref.sort_values(by=list(ref.columns), ignore_index=True)
    # exact string-compare cell values (mimic hash compare)
    am = a.astype(str); bm = b.astype(str)
    if not am.equals(bm):
        diff = (am != bm)
        ncell = int(diff.values.sum())
        fails.append(name)
        print(f" FAIL  {name}: {ncell} differing cells")
        idx = diff.any(axis=1)
        print("  mine:", a[idx].head(3).to_dict("records"))
        print("  ref :", b[idx].head(3).to_dict("records"))
    else:
        print(f" PASS  {name}: {len(mine)} rows")

print(f"\n{len(names)-len(fails)}/{len(names)} pass")
sys.exit(1 if fails else 0)
