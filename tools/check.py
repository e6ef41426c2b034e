#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle gate.

Not part of the Scala library. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> spark parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet),
sorts columns by name + rows by all columns, and compares values exactly
(floats: exact bits, with a near-miss report). DECIMAL-vs-float dtype
mismatch is a FAIL, never coerced — the driver's hash is representation-
sensitive, so this mirror must be at least as strict (`--selftest`
demonstrates the gate on a synthetic decimal-vs-double pair).
"""
import sys, json, glob, os, warnings
from decimal import Decimal
import duckdb
import pandas as pd
import numpy as np
warnings.simplefilter("ignore")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def _is_decimal(arr):
    """True iff the column carries decimal.Decimal values (object dtype)."""
    if arr.dtype != object:
        return False
    for v in arr:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        return isinstance(v, Decimal)
    return False

def selftest():
    """End-to-end proof the decimal-vs-double gate fails: a spark-side
    DECIMAL parquet column against a float oracle with EQUAL values must
    produce a FAIL (exactly the q165 shape the old coercion waved
    through), and the same values as DOUBLE-vs-DOUBLE must pass."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/out/bad_decimal")
        os.makedirs(f"{d}/out/good_double")
        con.execute(f"""COPY (SELECT CAST(65.70 AS DECIMAL(18,2)) AS v)
                        TO '{d}/out/bad_decimal/part0.parquet'""")
        con.execute(f"""COPY (SELECT CAST(65.70 AS DOUBLE) AS v)
                        TO '{d}/out/good_double/part0.parquet'""")
        json.dump({"bad_decimal": "SELECT 65.7 AS v",
                   "good_double": "SELECT 65.7 AS v"},
                  open(f"{d}/out/oracle_sql.json", "w"))
        rc = main(d, f"{d}/out")
    assert rc == 1, ("exactly the decimal query must FAIL (and the double "
                     f"twin must pass): {rc} failures")
    print("selftest OK: decimal-vs-double trips the dtype gate (FAIL), "
          "double-vs-double with the same values passes")
    return 0

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if g.dtype != e.dtype:
                print(f"  note {name}.{c}: dtype {g.dtype} vs {e.dtype}")
            # The driver's hash is REPRESENTATION-sensitive: Decimal('65.70')
            # on the spark side vs float 65.7 on the oracle side is a red row
            # there, so it must be a FAIL here too — never coerced. (This
            # exact leniency let q165 ship red for a round while this mirror
            # said green.) Money/decimal outputs must be cast to DOUBLE on
            # BOTH sides (the q01 convention).
            gd, ed = _is_decimal(g), _is_decimal(e)
            if gd != ed:
                side = "spark" if gd else "oracle"
                print(f"FAIL {name}.{c}: dtype mismatch — {side} side is "
                      f"DECIMAL, other is {e.dtype if gd else g.dtype}; "
                      f"cast to DOUBLE on both sides (q01 convention)")
                ok = False
                continue
            if gd and ed:
                eq = np.array([x == y or (x is None and y is None)
                               for x, y in zip(g, e)])
                if not eq.all():
                    i = int(np.argmin(eq))
                    print(f"FAIL {name}.{c}: MISMATCH e.g. row{i}: "
                          f"{g[i]!r} vs {e[i]!r}")
                    ok = False
                continue
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(np.asarray(e).dtype, np.floating):
                g = g.astype(float); e = e.astype(float)
                eq = (g == e) | (np.isnan(g) & np.isnan(e))
                if not eq.all():
                    close = np.isclose(g, e, rtol=1e-9, atol=1e-9) | (np.isnan(g) & np.isnan(e))
                    tag = "NEAR-MISS(fp)" if close.all() else "MISMATCH"
                    i = int(np.argmin(eq))
                    print(f"FAIL {name}.{c}: {tag} e.g. row{i}: {g[i]!r} vs {e[i]!r}")
                    ok = False
            else:
                eq = pd.Series(g).astype(object).fillna("\0") == pd.Series(e).astype(object).fillna("\0")
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    print(f"FAIL {name}.{c}: MISMATCH e.g. row{i}: {g[i]!r} vs {e[i]!r}")
                    ok = False
        if ok: print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else: n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return n_fail

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
