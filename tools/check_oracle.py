#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the
sfDir tables, sorts columns by name, sorts rows, and compares
stringified values. Not part of the library — parity harness only.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def fam(t):
    if t in INT_FAMILY:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t  # HUGEINT, DECIMAL(...), VARCHAR, TIMESTAMP, ... stand alone


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(g_cols)} FROM got ORDER BY ALL").fetchall()
            exp = con.sql(sql)
            e_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(e_cols)} FROM exp ORDER BY ALL").fetchall()
            if g_cols != e_cols:
                print(f"FAIL {name}: columns {g_cols} != {e_cols}")
                n_fail += 1
                continue
            # Type parity: the driver hashes stringified values, and
            # e.g. DuckDB HUGEINT (sum over ints) stringifies unlike
            # Spark BIGINT. Flag family-level mismatches here, not in
            # the driver run (int-width diffs stringify identically).
            g_types = dict(zip(got.columns, [str(t) for t in got.types]))
            e_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
            type_diff = {c: (g_types[c], e_types[c]) for c in g_types
                         if fam(g_types[c]) != fam(e_types[c])}
            if type_diff:
                print(f"FAIL {name}: type mismatch {type_diff}")
                n_fail += 1
                continue
            gs = [tuple(norm(v) for v in r) for r in got_rows]
            es = [tuple(norm(v) for v in r) for r in exp_rows]
            if gs == es:
                print(f"PASS {name} ({len(gs)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(gs)} vs {len(es)} rows")
                for i, (a, b) in enumerate(zip(gs, es)):
                    if a != b:
                        print(f"  first diff row {i}:\n   got {a}\n   exp {b}")
                        break
                if len(gs) != len(es):
                    only_g = set(gs) - set(es)
                    only_e = set(es) - set(gs)
                    for r in list(only_g)[:3]:
                        print(f"   only-got {r}")
                    for r in list(only_e)[:3]:
                        print(f"   only-exp {r}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail "
          f"(duckdb {duckdb.__version__})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
