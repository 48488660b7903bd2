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
    def cell_eq(x, y):
        # array/list-typed parquet cells arrive as numpy arrays /
        # lists: pd.isna on them is ambiguous and == is elementwise,
        # so compare as tuples (recursively for nested arrays)
        if isinstance(x, dict) or isinstance(y, dict):
            # struct-typed cells arrive as dicts: compare key-by-key
            if not (isinstance(x, dict) and isinstance(y, dict)):
                return False
            if set(x.keys()) != set(y.keys()):
                return False
            return all(cell_eq(x[k], y[k]) for k in x)
        if isinstance(x, (list, tuple)) or hasattr(x, "__len__") and \
                not isinstance(x, (str, bytes)):
            if not (isinstance(y, (list, tuple)) or hasattr(y, "__len__") and
                    not isinstance(y, (str, bytes))):
                return False
            # a 0-d numpy array has __len__ on its type but len()
            # raises TypeError — fall through to the scalar path.
            # Only the len() probes sit inside the guard: a TypeError
            # raised by the RECURSIVE element compare must propagate,
            # not silently reroute two genuinely sequence-valued cells
            # to the scalar path (a wrong verdict, not a crash).
            try:
                lx, ly = len(x), len(y)
            except TypeError:
                lx = ly = None
            if lx is not None:
                if lx != ly:
                    return False
                return all(cell_eq(xi, yi) for xi, yi in zip(x, y))
        try:
            if pd.isna(x) and pd.isna(y):
                return True
        except (TypeError, ValueError):
            pass
        # asymmetric scalar-vs-array (a NULL against a list cell —
        # exactly the diff class this script must REPORT, not crash
        # on): == would be elementwise and its truth test ambiguous
        try:
            return bool(x == y)
        except (TypeError, ValueError):
            return False

    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype == object or b[c].dtype == object:
            ok = all(cell_eq(x, y) for x, y in zip(av, bv))
        else:
            ok = bool(((av == bv) | (pd.isna(av) & pd.isna(bv))).all())
        if not ok:
            diffs.append((n, f"column {c} differs (incl. row order)"))
            break

for n, why in diffs:
    print(f"DIFF {n}: {why}")
print(f"{len(names) - len(diffs)} identical, {len(diffs)} divergent "
      f"of {len(names)} queries")
sys.exit(1 if diffs else 0)
