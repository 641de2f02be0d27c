#!/usr/bin/env python3
"""North-rule determinism check: two Verify output dirs (run at different
SPARK_GRAFT_CPUS levels) must be bit-identical query by query after
column-sort + row-sort (content independent of parallelism)."""
import sys, glob, os
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a_dir)
               if os.path.isdir(f"{a_dir}/{d}") and not d.startswith("_"))
same = diff = 0
for name in names:
    fa = glob.glob(f"{a_dir}/{name}/*.parquet")
    fb = glob.glob(f"{b_dir}/{name}/*.parquet")
    if not fa or not fb:
        print(f"MISSING {name}"); diff += 1; continue
    a = pd.concat([pd.read_parquet(f) for f in fa])
    b = pd.concat([pd.read_parquet(f) for f in fb])
    cols = sorted(a.columns)
    a = a.reindex(cols, axis=1).sort_values(by=cols).reset_index(drop=True)
    b = b.reindex(sorted(b.columns), axis=1).sort_values(by=cols).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(a, b, check_exact=True)
        same += 1
    except AssertionError as e:
        print(f"DIFF {name}: {str(e).splitlines()[-1][:150]}")
        diff += 1
print(f"{same} identical, {diff} diffs")
sys.exit(1 if diff else 0)
