#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and diff.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = pq.read_table(files[0]).to_pylist()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            want = [dict(zip(cols, row)) for row in cur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        g_cols = sorted(got[0].keys()) if got else sorted(cols)
        w_cols = sorted(cols)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns differ spark={g_cols} duck={w_cols}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1; continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            for c in g_cols:
                if norm_cell(g[c]) != norm_cell(w[c]):
                    bad = (i, c, g[c], w[c]); break
            if bad: break
        if bad:
            i, c, gv, wv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gv!r} duck={wv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
