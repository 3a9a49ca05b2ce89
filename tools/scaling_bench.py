#!/usr/bin/env python3
"""Empirical scaling rehearsal (round-12 verdict task 1).

The plan audits argue every query is corpus-linear (modulo sort/agg
log factors); this measures it. Runs graft.Bench on SAME-GENERATOR
corpora at three row scales (10x apart: ~sf0.01 / ~sf0.1 / ~sf1 from
tools/gen_seeded_testdata.py, seed 42) over a fixed query subset, and
writes per-query (scale, seconds) triples plus growth ratios.

A query is flagged superlinear when t(sf1)/t(sf0.1) exceeds
ALLOWANCE x 10 (the data grows 10x; the allowance covers O(n log n)
plus fixed per-query overheads that DEFLATE the ratio at small t —
so in practice ratios sit well under 10 for linear operators).

Usage: scaling_bench.py <outJson> [--dirs d1,d2,d3] [--queries a,b,..]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

# top-10 most expensive at sf0.1 (bench_out.json r11) + one per
# family not already covered: A stac_link_extract/hilbert_index,
# B revenue_theil_sen/q1, C dedup_*, D knn_brute_force, E text_tfidf,
# F multimodal_frames, G stream_upsert_latest/stream_importance,
# H curate_corpus
DEFAULT_QUERIES = [
    "dedup_lsh_tuning", "revenue_theil_sen", "dedup_threshold_sweep",
    "dedup_minhash_estimator", "stream_upsert_latest",
    "dedup_ngram_jaccard", "stream_importance", "dedup_token_shift",
    "stac_link_extract", "dedup_containment",
    "q1_pricing_summary", "hilbert_index", "knn_brute_force",
    "text_tfidf", "multimodal_frames", "curate_corpus",
]

DEFAULT_DIRS = [("sf0.01", "/tmp/sf001g", 10),
                ("sf0.1", "/tmp/sf01g", 100),
                ("sf1", "/tmp/sf1", 1000)]

ALLOWANCE = 1.5  # O(n log n) + noise headroom on the 10x step


def run_bench(sf_dir, queries, out_path):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-Xmx100g",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Bench"]
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=",".join(queries),
               SPARK_GRAFT_BENCH_OUT=out_path,
               SPARK_GRAFT_BENCH_BUDGET_SEC="2400",
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    subprocess.run(cmd, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_path) as f:
        return json.load(f)["queries"]


def main():
    out_json = sys.argv[1]
    dirs = DEFAULT_DIRS
    queries = DEFAULT_QUERIES
    for a in sys.argv[2:]:
        if a.startswith("--dirs="):
            parts = a.split("=", 1)[1].split(",")
            dirs = [(f"d{i}", p, 10 ** (i + 1))
                    for i, p in enumerate(parts)]
        elif a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
    times = {}
    for label, path, scale in dirs:
        print(f"== bench {label} ({path}, rows x{scale})", flush=True)
        t = run_bench(path, queries, f"/tmp/scaling_{label}.json")
        times[label] = t
        for q in queries:
            print(f"   {q}: {t.get(q)}", flush=True)
    labels = [d[0] for d in dirs]
    result = {"round": 12, "generator": "tools/gen_seeded_testdata.py",
              "seed": 42, "local": "local[32]",
              "dirs": {l: p for l, p, _ in dirs},
              "rows_scale": {l: s for l, _, s in dirs},
              "allowance_explained":
                  "10x data per step; flag when t ratio > 10*%s "
                  "(O(n log n) + noise headroom)" % ALLOWANCE,
              "queries": {}}
    flagged = []
    for q in queries:
        entry = {l: times[l].get(q) for l in labels}
        t_mid, t_big = entry.get(labels[-2]), entry.get(labels[-1])
        if t_mid and t_big and t_mid > 0:
            ratio = t_big / t_mid
            entry["ratio_last_step"] = round(ratio, 2)
            entry["verdict"] = ("superlinear"
                                if ratio > 10 * ALLOWANCE else "ok")
            if entry["verdict"] == "superlinear":
                flagged.append(q)
        result["queries"][q] = entry
    result["flagged_superlinear"] = flagged
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}; flagged={flagged}")


if __name__ == "__main__":
    main()
