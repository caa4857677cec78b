#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over the raw tables in
<sfDir>, and compares row count, sorted-by-name schema, and a
value hash (rows sorted, columns sorted by name).
Dev tooling only — not part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def frame_sig(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"rows {name}: rows={len(got)} (no oracle){' EMPTY!' if len(got)==0 else ''}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        problems = []
        if len(g) != len(e):
            problems.append(f"rows {len(g)} vs {len(e)}")
        gs = [(c, str(g[c].dtype)) for c in g.columns]
        es = [(c, str(e[c].dtype)) for c in e.columns]
        if [c for c, _ in gs] != [c for c, _ in es]:
            problems.append(f"cols {gs} vs {es}")
        elif gs != es:
            problems.append(f"dtypes {gs} vs {es}")
        if not problems and frame_sig(g) != frame_sig(e):
            diff = None
            for i in range(min(len(g), 50000)):
                for c in g.columns:
                    if norm_cell(g[c][i]) != norm_cell(e[c][i]):
                        diff = f"first diff row {i} col {c}: {g[c][i]!r} vs {e[c][i]!r}"
                        break
                if diff:
                    break
            problems.append(f"hash mismatch ({diff})")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
