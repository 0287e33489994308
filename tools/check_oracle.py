#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each `<verify_out_dir>/<name>/` parquet result produced by
`graft.Verify`, runs the matching SQL from `oracle_sql.json` in DuckDB
(with one view per `<sf_dir>/<table>.parquet`), sorts columns by name and
rows by all columns, and compares values exactly. Prints MATCH/MISMATCH
per query; exits nonzero on any mismatch.

Dev-side tool only (python/duckdb are driver-side deps, not library deps).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # canonicalize -0.0 and NaN; keep full precision otherwise
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failed = []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_rel = con.sql(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        # The driver's pandas-based sorter crashes on array/struct columns
        # (unhashable numpy.ndarray) — reject them here so the local gate
        # can never pass a shape the driver gate would fail.
        bad = [c for c, t in zip(got_rel.columns, got_rel.types)
               if any(k in str(t).upper() for k in ("[]", "STRUCT", "MAP", "LIST"))]
        if bad:
            print(f"{name}: REJECT array/struct output columns {bad} "
                  "(driver checker cannot sort these — flatten to scalars)")
            failed.append(name)
            continue
        got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(got)} (rows-only check)")
            continue
        exp_rel = con.sql(oracles[name])
        exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        if got_cols != exp_cols:
            print(f"{name}: MISMATCH columns {got_cols} != {exp_cols}")
            failed.append(name)
            continue
        if got == exp:
            print(f"{name}: MATCH rows={len(got)}")
            continue
        failed.append(name)
        print(f"{name}: MISMATCH rows got={len(got)} exp={len(exp)}")
        diffs = [(g, e) for g, e in zip(got, exp) if g != e]
        for g, e in diffs[:3]:
            print(f"   got {g}\n   exp {e}")
        if len(got) != len(exp):
            only_got = set(map(str, got)) - set(map(str, exp))
            only_exp = set(map(str, exp)) - set(map(str, got))
            for x in list(only_got)[:2]:
                print(f"   only-in-got {x}")
            for x in list(only_exp)[:2]:
                print(f"   only-in-exp {x}")
    for name in sorted(set(oracles) - set(names)):
        print(f"{name}: ORACLE-WITHOUT-RESULT (query failed in Verify?)")
        failed.append(name)
    print(f"== {len(names) - len(failed)}/{len(names)} match ==")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
