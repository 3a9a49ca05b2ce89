#!/usr/bin/env python3
"""Mechanical audit: flag every oracle `sum(...)` over a floating
expression that isn't (a) an integer/DECIMAL/HUGEINT sum or (b) an
ordered list_reduce fold.  An unpinned float SUM accumulates in
engine-specific order; on a 1-ulp seam the DuckDB result can cross a
floor(x*10^k+0.5) boundary that the Spark side (which folds sorted or
sums integers) does not — this is exactly how `events_anova` failed
the round-10 driver gate while passing every committed scale factor.

Usage: audit_float_sums.py <oracle_sql.json> [--json out.json]

Heuristics (inspect each hit by hand; the goal is zero *unreviewed*
hits):
  - extract each `sum( <expr> )` with balanced parens;
  - a hit is FLOAT if the expr contains ::DOUBLE / ::FLOAT / a float
    literal (digits with a decimal point) / a division `/` (integer
    `//` excluded) / sqrt / ln / log / exp / power / a reference to a
    known-double column alias;
  - a hit is SAFE if the expr is pure integer arithmetic, is cast to
    HUGEINT/DECIMAL/BIGINT *around* the outermost product, or the sum
    feeds only a count/rank (not a floored float output).
The script only CLASSIFIES float-vs-integer; deciding SAFE for a
remaining float hit is a human judgment recorded in the allowlist
below with a reason.  Exit 1 if any float hit is not allowlisted.
"""
import json
import re
import sys

# Reviewed float sums that are provably order-independent or
# single-row.  Format: (query, snippet-substring) -> reason.
ALLOWLIST = {
}

# Secondary scan: sum(a * b) / sum(a / b) over bare identifiers whose
# type the regex can't see.  Each hit must be reviewed by hand and
# recorded here as integer-typed (exact in any order) or converted.
# Format: (query, snippet-substring) -> reason.
REVIEWED_IDENT_PRODUCTS = {
    ("events_gini", "rank::HUGEINT * v"): "BIGINT×BIGINT in HUGEINT",
    ("revenue_bootstrap_ci", "w::HUGEINT * c"): "ints in HUGEINT",
    ("revenue_acf", "x::HUGEINT * x"): "ints in HUGEINT",
    ("revenue_acf", "a.x::HUGEINT * b.x"): "ints in HUGEINT",
    ("revenue_changepoint", "x::HUGEINT * x"): "ints in HUGEINT",
    ("segment_trend", "x::HUGEINT * y"): "ints in HUGEINT",
    ("segment_trend", "x::HUGEINT * x"): "ints in HUGEINT",
    ("text_burstiness", "c::HUGEINT * c"): "counts in HUGEINT",
    ("events_ab_ttest", "floor(value * 100.0 + 0.5) AS HUGEINT"):
        "integer cents moments in HUGEINT",
    ("events_skew_join", "floor(value * 100.0 + 0.5) AS HUGEINT"):
        "integer cents × int weight in HUGEINT",
    ("embedding_jl_distortion", "s.sgn * q.q"):
        "±1 sign × quantized BIGINT component: integer sum",
    ("embedding_jl_project", "s.sgn * q.q"):
        "±1 sign × quantized BIGINT component: integer sum",
    ("embedding_norm_audit", "s * s"):
        "s is a floored 1e-4-unit BIGINT norm: integer sum",
    ("events_retention_fit", "day_offset * lru"):
        "BIGINT offset × 1e-9-unit BIGINT ln(rate): integer sum",
    ("events_retention_fit", "dd * dd"):
        "integer-valued doubles ≤ 14²: exact in any order",
    ("q18_large_orders", "l_quantity"):
        "integral-valued double qty: exact below 2^53",
    ("q20_dominant_suppliers", "l_quantity"):
        "integral-valued double qty: exact below 2^53",
    ("q1_pricing_summary", "qty"):
        "integral-valued double qty: exact below 2^53",
    ("q6_forecast_revenue", "floor(l_extendedprice * 100.0 + 0.5)"):
        "integer cents × integer hundredths in HUGEINT",
    ("selection_bias_audit", "k.keep * d.n_chars"):
        "0/1 gate × BIGINT length: integer sum (squares ride HUGEINT)",
    ("q11_part_value_share", "CAST(floor(l_quantity + 0.5) AS BIGINT)"):
        "HUGEINT cents × nearest-quantized BIGINT qty: exact product",
    ("q9_product_profit",
     "100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)"):
        "HUGEINT cents × integer hundredths: exact product",
}


def ident_product_candidates(q, sql):
    """sum(...) args that multiply/divide bare identifiers — possible
    float sums the type-blind primary heuristics can't classify."""
    out = []
    for e in extract_sums(sql):
        s = strip_hugeint_products(e)
        if re.search(r"HUGEINT|DECIMAL|::BIGINT\s*$", s, re.I):
            continue
        if re.search(r"[a-z_][a-z0-9_.]*\s*[*]\s*[a-z_]", s, re.I) \
                or re.search(r"(?<!/)/(?!/)", s):
            out.append(e)
    return out


def extract_fn(sql, fn):
    """Yield the argument of every fn(...) with balanced parens."""
    out = []
    for m in re.finditer(rf"\b{fn}\s*\(", sql, re.I):
        i = m.end()
        depth = 1
        j = i
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        out.append(sql[i:j - 1].strip())
    return out


def extract_sums(sql):
    return extract_fn(sql, "sum")


# avg(x) is sum(x)/count — the same unordered-float-reduction seam.
# Integer-valued args (exact in double below 2^53) and dyadic scalings
# (x / 2^k only shifts the exponent) are order-exact; everything else
# must be converted to integer units or reviewed here.
AVG_ALLOWLIST = {
    ("doc_length_profile", "n_tok"): "integer token counts",
    ("stream_bm25", "dl"): "integer-valued double word counts",
    ("text_bm25", "dl"): "integer-valued double word counts",
    ("pack_efficiency", "tok::DOUBLE / 512"):
        "dyadic: /2^9 only shifts the exponent, addends exact",
    ("spatial_locality_report", "area"): "integer grid-cell areas",
    ("curriculum_order", "n_tok"): "integer token counts",
}


FLOAT_PAT = re.compile(
    r"::\s*DOUBLE|::\s*FLOAT|\bsqrt\s*\(|\bln\s*\(|\blog\s*|\bexp\s*\("
    r"|\bpower\s*\(|\bpow\s*\(|\d\.\d", re.I)
# testdata columns stored as DOUBLE: any arithmetic over them is a
# float expression even with no literal/cast in sight
DOUBLE_COLS = re.compile(
    r"\b(c_acctbal|s_acctbal|p_retailprice|o_totalprice|l_quantity"
    r"|l_extendedprice|l_discount|l_tax|value)\b", re.I)
# a single '/' (not '//') anywhere in the expr
DIV_PAT = re.compile(r"(?<!/)/(?!/)")


OUTER_INT_CAST = re.compile(
    r"^CAST\s*\(.*AS\s+(BIGINT|HUGEINT|INTEGER|INT128)\s*\)$",
    re.I | re.S)


def balanced(e):
    d = 0
    for ch in e:
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
        if d < 0:
            return False
    return d == 0


HUGEINT_PRODUCT = re.compile(
    r"CAST\s*\([^()]*\([^()]*\)[^()]*AS\s+HUGEINT\s*\)", re.I)


def strip_hugeint_products(e):
    """Remove every CAST(... AS HUGEINT) subterm (balanced) so the
    float heuristics don't fire on literals INSIDE an exact integer
    cast — `CAST(floor(x*100.0+0.5) AS HUGEINT) * n` is an exact
    HUGEINT product, not a float expression."""
    out = []
    i = 0
    up = e.upper()
    while i < len(e):
        if up.startswith("CAST", i) and (i == 0 or not e[i-1].isalnum()):
            j = e.index("(", i)
            depth = 1
            k = j + 1
            while k < len(e) and depth:
                if e[k] == "(":
                    depth += 1
                elif e[k] == ")":
                    depth -= 1
                k += 1
            inner = e[j+1:k-1]
            if re.search(r"AS\s+(HUGEINT|BIGINT|INTEGER)\s*$", inner,
                         re.I):
                out.append("INTTERM")
                i = k
                continue
        out.append(e[i])
        i += 1
    return "".join(out)


def is_float_expr(e):
    # an outermost integer cast makes the SUM integer-exact no matter
    # what float math happens per-row inside it
    m = OUTER_INT_CAST.match(e)
    if m and balanced(e[e.index("(") + 1:e.rindex(")")]):
        return False
    if e.rstrip().upper().endswith("::HUGEINT") or \
       e.rstrip().upper().endswith("::BIGINT"):
        return False
    # exact integer casts inside the expr (HUGEINT/BIGINT products)
    # are integer terms — blank them before the float heuristics
    e = strip_hugeint_products(e)
    # a CASE whose branches are an integer term and an integer literal
    # sums exactly regardless of what float math sits in the GUARD —
    # the condition picks the branch, it never enters the sum
    if re.match(r"^\s*CASE\s+WHEN\s.*\sTHEN\s+INTTERM\s+"
                r"ELSE\s+\d+\s+END\s*$", e, re.I | re.S):
        return False
    if FLOAT_PAT.search(e):
        return True
    if DIV_PAT.search(e):
        return True
    if DOUBLE_COLS.search(e):
        return True
    return False


def main():
    path = sys.argv[1]
    oracles = json.load(open(path))
    hits = []
    for q, sql in sorted(oracles.items()):
        for e in extract_sums(sql):
            if not is_float_expr(e):
                continue  # integer/DECIMAL/HUGEINT sum: order-exact
            key_ok = any(q == aq and snip in e
                         for (aq, snip) in ALLOWLIST)
            hits.append({"query": q, "expr": e,
                         "allowlisted": key_ok,
                         "reason": next((r for (aq, snip), r
                                         in ALLOWLIST.items()
                                         if q == aq and snip in e),
                                        None)})
    bad = [h for h in hits if not h["allowlisted"]]
    print(f"float-sum hits: {len(hits)}  unreviewed: {len(bad)}")
    for h in hits:
        tag = "OK  " if h["allowlisted"] else "FLAG"
        print(f"{tag} {h['query']}: sum({h['expr'][:120]})")
    # avg() pass: any float avg is flagged unless allowlisted; bare
    # identifiers are flagged too (type-blind) so every avg gets a
    # reviewed entry
    avg_hits = []
    for q, sql in sorted(oracles.items()):
        for e in extract_fn(sql, "avg"):
            ok = any(q == aq and snip in e
                     for (aq, snip) in AVG_ALLOWLIST)
            avg_hits.append({"query": q, "expr": e, "reviewed": ok})
    bad_avg = [h for h in avg_hits if not h["reviewed"]]
    print(f"avg hits: {len(avg_hits)}  unreviewed: {len(bad_avg)}")
    for h in bad_avg:
        print(f"AVG  {h['query']}: avg({h['expr'][:120]})")
    # secondary pass: type-blind identifier products
    cand = []
    for q, sql in sorted(oracles.items()):
        for e in ident_product_candidates(q, sql):
            ok = any(q == aq and snip in e
                     for (aq, snip) in REVIEWED_IDENT_PRODUCTS)
            cand.append({"query": q, "expr": e, "reviewed": ok})
    badc = [c for c in cand if not c["reviewed"]]
    print(f"ident-product candidates: {len(cand)}  "
          f"unreviewed: {len(badc)}")
    for c in badc:
        print(f"CAND {c['query']}: "
              f"sum({c['expr'][:120]})".replace(chr(10), " "))
    if len(sys.argv) > 3 and sys.argv[2] == "--json":
        json.dump({"float": hits, "ident": cand},
                  open(sys.argv[3], "w"), indent=1)
    sys.exit(1 if bad or badc or bad_avg else 0)


if __name__ == "__main__":
    main()
