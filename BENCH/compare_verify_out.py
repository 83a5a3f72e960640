#!/usr/bin/env python3
"""Result-identity check between two graft.Verify output dirs.

Usage: python3 compare_verify_out.py <baseline_dir> <candidate_dir>

For every query subdir present in the baseline, loads both parquet outputs,
canonicalises (stringify cells incl. nested lists, sort columns by name,
sort rows lexicographically) and asserts equality — schema (names+dtypes in
original order) and full row multiset. Exit 0 = identical.
"""
import sys, os, glob
import pandas as pd


def canon(df: pd.DataFrame):
    schema = [(c, str(df[c].dtype)) for c in df.columns]
    s = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple("\0NULL" if v is None or (isinstance(v, float) and pd.isna(v))
              else str(v) for v in row)
        for row in s.itertuples(index=False, name=None))
    return schema, rows


def load(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:  # Spark writes a directory with part files
        files = sorted(glob.glob(os.path.join(d, "part-*")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
        if files else pd.read_parquet(d)


def main(base, cand):
    queries = sorted(x for x in os.listdir(base)
                     if os.path.isdir(os.path.join(base, x)))
    bad = []
    for q in queries:
        try:
            b = load(os.path.join(base, q))
            c = load(os.path.join(cand, q))
        except Exception as e:
            bad.append((q, f"load error: {e}"))
            continue
        bs, br = canon(b)
        cs, cr = canon(c)
        if bs != cs:
            bad.append((q, f"schema differs: {bs} vs {cs}"))
        elif br != cr:
            cr_set, br_set = set(cr), set(br)
            diff_b = [r for r in br if r not in cr_set][:3]
            diff_c = [r for r in cr if r not in br_set][:3]
            bad.append((q, f"rows differ ({len(br)} vs {len(cr)}): "
                           f"only-base={diff_b} only-cand={diff_c}"))
        else:
            print(f"OK   {q} ({len(br)} rows)")
    for q, msg in bad:
        print(f"FAIL {q}: {msg}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
