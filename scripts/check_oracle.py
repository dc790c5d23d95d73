#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's parquet dumps against
the DuckDB oracle SQL and compare exactly (columns sorted by name, rows sorted,
values compared exactly — bitwise for floats).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(Dev-only; the builder's code itself never depends on Python.)
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v) if v is not None else "\x00NULL")
        out.append(tuple(vals))
    out.sort()
    return [colnames[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(f))[0]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        got_cols = tbl.column_names
        got_rows = [tuple(row[c] for c in got_cols) for row in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            exp_rows = cur.fetchall()
            exp_cols = [d[0] for d in cur.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, gr = normalize(got_rows, got_cols)
        ec, er = normalize(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={ec}")
            n_fail += 1
            continue
        if gr != er:
            print(f"FAIL {name}: {len(gr)} spark rows vs {len(er)} duckdb rows")
            shown = 0
            for i in range(max(len(gr), len(er))):
                a = gr[i] if i < len(gr) else None
                b = er[i] if i < len(er) else None
                if a != b and shown < 5:
                    print(f"   row {i}: spark={a}")
                    print(f"          duck ={b}")
                    shown += 1
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
