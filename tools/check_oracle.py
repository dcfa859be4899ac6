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
import pandas as pd
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


def driver_hash(name, spark_files, con, sql):
    """Reproduce the driver's dtype-sensitive sort+hash compare.

    The driver loads both frames into pandas, orders columns by name,
    sorts rows by all columns (pandas sort_values — dies on array
    cells), and hashes the frame (dtype-sensitive: DuckDB HUGEINT →
    float64 hashes differently from Spark's int64 even when every cell
    matches).  The per-cell diff in main() misses exactly that class,
    so this runs as a second gate.  Returns None on pass, else a
    failure string.
    """
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)],
                        ignore_index=True)
        odf = con.execute(sql).df()
    except Exception as e:
        return f"load: {e}"

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    try:
        s, o = canon(sdf), canon(odf)
    except Exception as e:
        return f"sort_values (unsortable column, like the driver): {e}"
    # hash_pandas_object is the driver's comparator: integer widths hash
    # by VALUE (int32 1 == int64 1), but int↔float/object kind changes
    # hash by representation — exactly the HUGEINT→float64 class. So the
    # hash itself is the verdict; dtypes are reported as diagnostics.
    try:
        hs = pd.util.hash_pandas_object(s, index=False).values
        ho = pd.util.hash_pandas_object(o, index=False).values
    except Exception as e:
        return f"hash: {e}"
    if len(hs) != len(ho) or not (hs == ho).all():
        dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
              if s[c].dtype.kind != o[c].dtype.kind]
        hint = ("; dtype-kind drift " + ", ".join(
            f"{c}: spark={a} duck={b}" for c, a, b in dt)) if dt else ""
        return f"frame hash mismatch after sort{hint}"
    return None


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
        files = sorted(glob.glob(f"{pdir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            # read ALL parts (Verify coalesces to 1 today, but the gate
            # must not silently halve multi-part output)
            got = [r for f in files for r in pq.read_table(f).to_pylist()]
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
            continue
        herr = driver_hash(name, files, con, sql)
        if herr:
            print(f"FAIL {name}: driver-hash: {herr}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
