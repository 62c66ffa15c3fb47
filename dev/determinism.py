#!/usr/bin/env python3
"""Cross-parallelism determinism sweep: run graft.Verify twice with different
SPARK_GRAFT_CPUS into two dirs, then `python3 dev/determinism.py dirA dirB` —
flags any query whose (sorted) output differs between partitionings."""
import duckdb, glob, os, sys
import numpy as np
a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(os.path.basename(p) for p in glob.glob(f'{a_dir}/*') if os.path.isdir(p))
bad = 0
for n in names:
    a = con.execute(f"SELECT * FROM read_parquet('{a_dir}/{n}/*.parquet')").fetchdf()
    b = con.execute(f"SELECT * FROM read_parquet('{b_dir}/{n}/*.parquet')").fetchdf()
    for df in (a, b):  # array cells (e.g. q45 thumb) are unhashable; stringify
        for c in df.columns:
            if df[c].dtype == object and df[c].map(lambda x: isinstance(x, np.ndarray)).any():
                df[c] = df[c].map(lambda x: str(list(x)) if isinstance(x, np.ndarray) else str(x))
    a = a[sorted(a.columns)].sort_values(by=sorted(a.columns), kind='mergesort').reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(by=sorted(b.columns), kind='mergesort').reset_index(drop=True)
    if a.shape != b.shape:
        print('DIFF-SHAPE', n, a.shape, b.shape); bad += 1; continue
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.number):
            neq = ~((av.isna() & bv.isna()) | (av == bv))
        else:
            neq = av.astype(str) != bv.astype(str)
        if neq.any():
            print('DIFF', n, c, int(neq.sum())); bad += 1
print('determinism:', 'FAIL' if bad else 'PASS', f'({len(names)} queries)')
sys.exit(1 if bad else 0)
