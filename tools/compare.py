#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name> dir of parquet under verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB (tables = parquet views over sfDir), sorts
columns by name, sorts rows, and compares values cell by cell.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bound the spill AND the heap (r17): an exact-instrument oracle
    # re-run at a big derived SF can spill quadratically (q130's PQ
    # recomputation filled the disk at sf1.0, then OOM-killed the
    # process once spill was capped) — fail THAT query cleanly, not
    # the host or the whole gate
    con.execute("SET max_temp_directory_size='40GB'")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            # driver testdata tables are single files; derived scratch
            # tables are Spark directory-parquet — glob those
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"SKIP {name}: no parquet written"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows"); n_skip += 1; continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b and not (a is None and b is None) and str(a) != str(b):
                    import math
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
            n_fail += 1
            continue
        # Driver-parity dtype strictness: the driver hashes string
        # REPRESENTATIONS, so an oracle column that materializes as float64
        # (e.g. DuckDB HUGEINT from list_sum) against Spark's int64 can be
        # value-equal here ("8 == 8.0") yet hash-mismatch in the gate
        # ("8.5e8" vs "850000000"). Both frames arrive through duckdb .df(),
        # so any dtype asymmetry is an oracle-SQL dtype drift — fail it.
        dbad = [(c, str(g[c].dtype), str(e[c].dtype))
                for c in g.columns if g[c].dtype != e[c].dtype]
        if dbad:
            c, gd, ed = dbad[0]
            print(f"FAIL {name}: DTYPE col {c}: spark {gd} vs oracle {ed}"
                  f" (values matched — CAST the oracle column)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
