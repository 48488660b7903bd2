#!/usr/bin/env python3
"""Determinism audit: compare two Verify dump dirs cell-by-cell
INCLUDING row order (stricter than the driver's sorted compare — the
engine's own orderBy tails must produce identical files under
different parallelism).

Usage: python3 scripts/detcmp.py <dirA> <dirB>
"""
import sys, os
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(n for n in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, n)))
b_names = sorted(n for n in os.listdir(b_dir)
                 if os.path.isdir(os.path.join(b_dir, n)))
if names != b_names:
    print(f"DIFF query sets: only-in-A={set(names)-set(b_names)} "
          f"only-in-B={set(b_names)-set(names)}")
    sys.exit(1)

diffs = []
for n in names:
    a = pd.read_parquet(os.path.join(a_dir, n))
    b = pd.read_parquet(os.path.join(b_dir, n))
    if list(a.columns) != list(b.columns):
        diffs.append((n, "columns"))
        continue
    if len(a) != len(b):
        diffs.append((n, f"rows {len(a)} != {len(b)}"))
        continue
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        if not eq.all():
            diffs.append((n, f"column {c} differs (incl. row order)"))
            break

for n, why in diffs:
    print(f"DIFF {n}: {why}")
print(f"{len(names) - len(diffs)} identical, {len(diffs)} divergent "
      f"of {len(names)} queries")
sys.exit(1 if diffs else 0)
