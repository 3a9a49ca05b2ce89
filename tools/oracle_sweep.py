#!/usr/bin/env python3
"""Scale-regression oracle sweep: machine-readable parity artifact.

Usage: python3 tools/oracle_sweep.py <sfDir> <verifyOutDir> <out.json>

Same compare as check_oracle.py (sort columns by name, sort rows,
compare stringified values; int/float family-level type parity), but
emits one JSON object per query so the sweep can be committed as a
per-round artifact (oracle_sf01.json) and diffed across rounds.
Queries with no oracle SQL entry are recorded as "no_oracle" with
their row count, mirroring the driver's rows-only treatment.

A handful of oracles are SUPERLINEAR re-derivations in SQL (recursive
-CTE minhash/cluster chains, all-pairs array math) that are fine at
the sf0.01 gate but grind for hours at sf0.1 — each query gets a
wall-clock budget (default 180 s, ORACLE_SWEEP_TIMEOUT_SEC overrides)
enforced with con.interrupt(); over-budget queries are recorded as
"skipped_timeout", which counts as neither pass nor fail.
"""
import json
import math
import os
import sys
import threading

import duckdb

TIMEOUT_SEC = float(os.environ.get("ORACLE_SWEEP_TIMEOUT_SEC", "180"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def fam(t):
    if t in INT_FAMILY:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir, out_json):
    import glob
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    results = {}
    n_pass = n_fail = n_noracle = 0

    def flush(partial):
        n_skip = sum(1 for r in results.values()
                     if r["status"] == "skipped_timeout")
        # pin the oracle engine version: a DuckDB-side summation-order
        # or cast-behavior change across versions must read as an
        # environment change in the artifact, not masquerade as an
        # operator regression (verdict-r10 task 7)
        summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "n_no_oracle": n_noracle, "n_skipped_timeout": n_skip,
                   "n_total": len(results),
                   "duckdb_version": duckdb.__version__}
        if partial:
            summary["partial"] = True
        with open(out_json, "w") as f:
            json.dump({"summary": summary, "queries": results}, f,
                      indent=1, sort_keys=True)

    def check_one(name, rec):
        got = con.sql(
            f"FROM read_parquet('{out_dir}/{name}/*.parquet')")
        g_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(g_cols)} FROM got ORDER BY ALL").fetchall()
        rec["spark_rows"] = len(got_rows)
        if name not in oracle:
            rec["status"] = "no_oracle"
            return
        exp = con.sql(oracle[name])
        e_cols = sorted(exp.columns)
        exp_rows = con.sql(
            f"SELECT {', '.join(e_cols)} FROM exp ORDER BY ALL").fetchall()
        rec["oracle_rows"] = len(exp_rows)
        if g_cols != e_cols:
            rec["status"] = "fail"
            rec["detail"] = f"columns {g_cols} != {e_cols}"
            return
        g_types = dict(zip(got.columns, [str(t) for t in got.types]))
        e_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
        type_diff = {c: (g_types[c], e_types[c]) for c in g_types
                     if fam(g_types[c]) != fam(e_types[c])}
        if type_diff:
            rec["status"] = "fail"
            rec["detail"] = f"type mismatch {type_diff}"
            return
        gs = [tuple(norm(v) for v in r) for r in got_rows]
        es = [tuple(norm(v) for v in r) for r in exp_rows]
        if gs == es:
            rec["status"] = "pass"
        else:
            rec["status"] = "fail"
            diff = next((i for i, (a, b) in enumerate(zip(gs, es))
                         if a != b), None)
            rec["detail"] = (f"row {diff} differs" if diff is not None
                             else f"{len(gs)} vs {len(es)} rows")

    for name in dumped:
        rec = {"status": None, "spark_rows": None, "oracle_rows": None,
               "detail": None}
        timer = threading.Timer(TIMEOUT_SEC, con.interrupt)
        timer.start()
        try:
            check_one(name, rec)
        except duckdb.InterruptException:
            rec["status"] = "skipped_timeout"
            rec["detail"] = f"oracle exceeded {TIMEOUT_SEC:.0f}s budget"
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                rec["status"] = "skipped_timeout"
                rec["detail"] = f"oracle exceeded {TIMEOUT_SEC:.0f}s budget"
            else:
                rec["status"] = "error"
                rec["detail"] = msg[:300]
        finally:
            timer.cancel()
        if rec["status"] == "pass":
            n_pass += 1
        elif rec["status"] == "no_oracle":
            n_noracle += 1
        elif rec["status"] in ("fail", "error"):
            n_fail += 1
        results[name] = rec
        # rewrite after EVERY query (the heavy all-pairs oracles run for
        # minutes at sf0.1 — a partial artifact beats a silent grind)
        flush(partial=True)
        print(f"[{len(results)}/{len(dumped)}] {rec['status']} {name}",
              flush=True)
    flush(partial=False)
    n_skip = sum(1 for r in results.values()
                 if r["status"] == "skipped_timeout")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no_oracle, "
          f"{n_skip} skipped_timeout -> {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
