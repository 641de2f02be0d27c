#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle_sql.json on the same sf dir. Sorts columns by name, sorts
rows, compares values."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# SKIP_QUERIES=a,b skips named queries — the recursive-closure oracles
# (d_neardup_components / d_neardup_dedupe) are quadratic in component
# size and take >1h in DuckDB at sf0.1 (seconds at the sf0.01 driver
# gate); skip them for sf0.1 self-checks.
skip = set(q for q in os.environ.get("SKIP_QUERIES", "").split(",") if q)
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if name in skip:
        print(f"SKIP     {name}")
        continue
    try:
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        exp = con.execute(sql).df()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duckdb={list(exp.columns)}")
            fail += 1; continue
        if len(got) != len(exp):
            print(f"ROWCOUNT {name}: spark={len(got)} duckdb={len(exp)}")
            fail += 1; continue
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        # normalize dtypes for compare
        for c in g.columns:
            if str(g[c].dtype).startswith("datetime") or str(e[c].dtype).startswith("datetime"):
                g[c] = pd.to_datetime(g[c]); e[c] = pd.to_datetime(e[c])
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"OK       {name} ({len(got)} rows)"); ok += 1
        except AssertionError as ex:
            print(f"VALUES   {name}: {str(ex).splitlines()[-1][:200]}")
            fail += 1
    except Exception as ex:
        print(f"ERROR    {name}: {str(ex)[:200]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
