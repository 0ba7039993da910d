#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-run]

1. (unless --skip-run) runs `sbt "runMain graft.Verify <sfDir> <outDir>"`
2. for each query in <outDir>/oracle_sql.json: runs the SQL in DuckDB with
   views over <sfDir>/*.parquet, reads the Spark parquet result, sorts
   columns by name and rows by value, and compares cell-by-cell.
Exit 0 iff every oracle-backed query matches and every query produced rows.
"""
import json, math, subprocess, sys
from decimal import Decimal
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-run" not in sys.argv:
        r = subprocess.run(
            ["sbt", "--client" if False else "-batch",
             f'runMain graft.Verify {sf} {out}'],
            cwd="/root/repo")
        if r.returncode != 0:
            print("VERIFY RUN FAILED"); sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads(Path(out, "oracle_sql.json").read_text())
    failures, passed = [], []
    result_dirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
    for name in sorted(result_dirs):
        spark_glob = f"{out}/{name}/*.parquet"
        try:
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM '{spark_glob}'").fetchall()
            scols = [d[0] for d in sdesc]
            stypes = {d[0]: d[1] for d in sdesc}
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}")); continue
        # The DRIVER's gate sorts rows with pandas, which crashes on
        # array/struct/map cells (numpy.ndarray is unhashable) — even for
        # rows-only checks. Fail locally on any non-scalar output column so
        # the divergence is caught before the driver run.
        nonscalar = [(c, t) for c, t in stypes.items()
                     if "[" in t or "STRUCT" in t or "MAP" in t]
        if nonscalar:
            failures.append((name,
                "non-scalar output columns (driver pandas sort crashes): "
                + ", ".join(f"{c}:{t}" for c, t in nonscalar)))
            continue
        order = ", ".join(f'"{c}"' for c in sorted(scols))
        srows = con.execute(
            f'SELECT {order} FROM \'{spark_glob}\' ORDER BY {order}').fetchall()
        if name not in oracle:
            status = "ROWS-ONLY"
            if len(srows) == 0:
                failures.append((name, "rows-only check: 0 rows"))
            else:
                passed.append((name, f"{status} {len(srows)} rows"))
            continue
        try:
            ddesc = con.execute(
                f"DESCRIBE SELECT * FROM ({oracle[name]})").fetchall()
            dcols = [d[0] for d in ddesc]
            dtypes = {d[0]: d[1] for d in ddesc}
            if sorted(dcols) != sorted(scols):
                failures.append((name,
                    f"schema mismatch spark={sorted(scols)} duck={sorted(dcols)}"))
                continue
            # Driver's gate hashes typed values: HUGEINT-vs-BIGINT (etc.)
            # drift must fail locally too, not just value drift.
            tbad = [(c, stypes[c], dtypes[c]) for c in sorted(scols)
                    if stypes[c] != dtypes[c]]
            if tbad:
                failures.append((name,
                    "type mismatch " + "; ".join(
                        f"{c}: spark={s} duck={d}" for c, s, d in tbad)))
                continue
            dorder = ", ".join(f'"{c}"' for c in sorted(dcols))
            drows = con.execute(
                f'SELECT {dorder} FROM ({oracle[name]}) ORDER BY {dorder}'
            ).fetchall()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}")); continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount spark={len(srows)} duck={len(drows)}"))
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for c, (sv, dv) in enumerate(zip(map(norm, sr), map(norm, dr))):
                if not cells_equal(sv, dv):
                    bad = (i, sorted(scols)[c], sv, dv)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"cell mismatch row={bad[0]} col={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"))
        else:
            passed.append((name, f"OK {len(srows)} rows"))

    for n, msg in passed:
        print(f"  PASS {n}: {msg}")
    for n, msg in failures:
        print(f"  FAIL {n}: {msg}")
    missing = set(oracle) - result_dirs
    for n in sorted(missing):
        print(f"  FAIL {n}: no spark output produced")
    print(f"{len(passed)} passed, {len(failures) + len(missing)} failed")
    sys.exit(1 if failures or missing else 0)

if __name__ == "__main__":
    main()
