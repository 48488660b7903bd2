#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same sf dir, sort
columns by name + rows by value, and compare cell-by-cell.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    res_dir = os.path.join(out_dir, name)
    if not os.path.isdir(res_dir):
        continue
    got = pd.read_parquet(res_dir)
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rows {len(got)} != {len(want)}"))
        continue
    # Dtype-strict gate: the driver's hash is dtype-sensitive (DuckDB
    # HUGEINT -> float64 vs Spark int64 hash-mismatches even when values
    # are equal), so fail here BEFORE the value compare. Datetime unit
    # (ns vs us) is the one normalization the driver also applies.
    def _dt(s):
        d = str(s.dtype)
        return "datetime64" if d.startswith("datetime64") else d
    bad_dtypes = [f"{c}: got={_dt(got[c])} want={_dt(want[c])}"
                  for c in got.columns if _dt(got[c]) != _dt(want[c])]
    if bad_dtypes:
        fails.append((name, "dtype mismatch " + "; ".join(bad_dtypes[:4])))
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    diff_cols = []
    for c in got.columns:
        gv = g[c]
        wv = w[c]
        try:
            eq = (gv.values == wv.values) | (gv.isna().values & wv.isna().values)
        except Exception:
            eq = gv.astype(str).values == wv.astype(str).values
        if not eq.all():
            i = int((~eq).argmax())
            diff_cols.append(f"{c}[row{i}]: got={gv.iloc[i]!r} want={wv.iloc[i]!r}")
    if diff_cols:
        fails.append((name, "; ".join(diff_cols[:3])))
    else:
        passes.append((name, len(got)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, r in skips:
    print(f"SKIP (no oracle) {n} ({r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} rows-only")
sys.exit(1 if fails else 0)
