#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
named after the parquet tables in <sfDir>, and compares with the Spark
result parquet in <verifyOutDir>/<name>/.  Compare = sort columns by name,
sort rows, exact value equality (floats compared bit-exact, which is the
worst case the driver could do).
"""
import sys, json, math
import duckdb

def norm(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        g = norm([tuple(r) for r in got.itertuples(index=False)])
        e = norm([tuple(r) for r in exp.itertuples(index=False)])
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if len(gr) != len(er) or any(not eq(a, b) for a, b in zip(gr, er)):
                bad = (i, gr, er); break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return list(a) == list(b)
    except ImportError:
        pass
    return str(a) == str(b)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
