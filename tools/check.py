#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle gate.

Not part of the Scala library. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> spark parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet),
sorts columns by name + rows by all columns, and compares values exactly
(floats: exact bits, with a near-miss report).
"""
import sys, json, glob, os, warnings
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
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
