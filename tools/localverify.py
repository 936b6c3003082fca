#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, creates DuckDB views over the
sfDir parquet tables, runs each oracle SQL, and compares cell-by-cell
against the Spark result parquet in <verifyOutDir>/<name>/.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return v


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for r, (er, gr) in enumerate(zip(exp, got)):
            for i, j in zip(ei, gi):
                a, b = norm(er[i]), norm(gr[j])
                # the driver hashes TYPED values: float 5.0 != int 5
                # there, even though == passes here (layout_zorder r4)
                if a != b or (isinstance(a, float) != isinstance(b, float)
                              and a is not None and b is not None):
                    bad = (r, exp_cols[i], a, b)
                    break
            if bad:
                break
        if bad:
            r, c, a, b = bad
            print(f"FAIL {name}: row {r} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(sys.argv[3:])))
