#!/usr/bin/env python3
"""Per-family scaling curve from bench artifacts (dev tooling).

Usage: python3 tools/scaling_curve.py sf:path [sf:path ...]
e.g.   python3 tools/scaling_curve.py 0.1:bench_full.json 1:BENCH_SF1_r05.json \
           2:BENCH_SF2_r06.json 5:BENCH_SF5_r07.json

Prints a markdown table: family totals per SF over the queries COMMON
to all artifacts (so new registry entries don't skew the curve), plus
the power-law exponent alpha with T ~ sf^alpha fitted on the
smallest->largest endpoints.
"""
import json, math, re, sys

FAMILIES = [
    ("tpch", re.compile(r"^q\d\d_")),
    ("fin", re.compile(r"^q_fin_")),
    ("relational", re.compile(r"^q_")),
    ("lake", re.compile(r"^lake_")),
    ("catalog/endpoint", re.compile(r"^(catalog_|endpoint_)")),
    ("text", re.compile(r"^text_")),
    ("dedup", re.compile(r"^dedup_")),
    ("ann/emb", re.compile(r"^(ann_|emb_)")),
    ("multimodal", re.compile(r"^mm_")),
    ("stream", re.compile(r"^stream_")),
]

def family(name):
    for fam, rx in FAMILIES:
        if rx.match(name):
            return fam
    return "other"

def main():
    runs = []
    for arg in sys.argv[1:]:
        sf, path = arg.split(":", 1)
        with open(path) as f:
            runs.append((float(sf), json.load(f)["queries"]))
    runs.sort()
    common = set(runs[0][1])
    for _, qs in runs[1:]:
        common &= set(qs)
    fams = sorted({family(q) for q in common})
    print(f"common queries: {len(common)}")
    hdr = ["family", "n"] + [f"sf{sf:g}" for sf, _ in runs] + ["alpha"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for fam in fams + ["TOTAL"]:
        qs = [q for q in common if fam == "TOTAL" or family(q) == fam]
        tot = [sum(run[q] for q in qs) for _, run in runs]
        lo_sf, hi_sf = runs[0][0], runs[-1][0]
        alpha = math.log(tot[-1] / tot[0]) / math.log(hi_sf / lo_sf)
        cells = [fam, str(len(qs))] + [f"{t:.1f}" for t in tot] + [f"{alpha:.2f}"]
        print("| " + " | ".join(cells) + " |")
    # slowest individual queries at the largest SF, for the audit
    sf, top = runs[-1]
    worst = sorted(((t, q) for q, t in top.items() if q in common), reverse=True)[:8]
    print(f"\nslowest at sf{sf:g}: " + ", ".join(f"{q} {t:.1f}s" for t, q in worst))

if __name__ == "__main__":
    main()
