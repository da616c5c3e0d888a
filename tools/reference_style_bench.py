#!/usr/bin/env python3
"""Single-node throughput baseline in the REFERENCE'S OWN idioms
(pandas + row loops + str.count — the style documented in SURVEY.md §4:
iterrows row-at-a-time, dtype=str membership lists, O(n^2) dedup), run
on the same parquet tables the Spark engine benches on. This gives the
"matches-or-beats the reference's single-node throughput" comparison
that the reference itself never published (BASELINE.md).

Usage: python3 tools/reference_style_bench.py /root/testdata/sf0.1
"""
import sys, time
import pandas as pd

def t(f):
    t0 = time.time(); r = f(); return time.time() - t0, r

def main(sf):
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    customer = pd.read_parquet(f"{sf}/customer.parquet")
    docs = pd.read_parquet(f"{sf}/documents.parquet")

    # q01-style clean filter, reference idioms (02_filter_by_CIN.py):
    # per-row loop, membership list, first-seen dedup via control list
    def clean_filter():
        building = [c for _, c in customer.iterrows()
                    if c["c_mktsegment"] == "BUILDING"]
        members = [c["c_custkey"] for c in building]
        control = []
        kept = []
        o = orders.sort_values(["o_orderdate", "o_orderkey"])
        for _, row in o.iterrows():
            if row["o_totalprice"] < 1000:      # price filter
                continue
            if str(row["o_orderdate"]) < "1996-01-01":  # date filter
                continue
            if row["o_custkey"] not in members:  # CIN-style membership
                continue
            if row["o_custkey"] in control:      # first-seen dedup
                continue
            control.append(row["o_custkey"])
            kept.append(row)
        return len(kept)

    # q09/q12-style keyword TF (04_tag_text_contracts.py:98-119):
    # per-doc per-keyword str.count loop
    KWS = ["join", "merge", "sort", "hash", "spark", "stream", "batch",
           "table", "row", "column"]
    def keyword_tf():
        total = 0
        for _, row in docs.iterrows():
            text = str(row["text"]).lower()
            for kw in KWS:
                total += text.count(kw)
        return total

    # q11-style wordcount dictionary (05_build_special_dictionary.py)
    def wordcount():
        import re
        counts = {}
        for _, row in docs.iterrows():
            for w in re.split(r"[^a-z]+", str(row["text"]).lower()):
                if w and w not in ("the", "a"):
                    counts[w] = counts.get(w, 0) + 1
        return sum(1 for v in counts.values() if v > 5)

    results = {}
    for name, fn in [("clean_filter", clean_filter),
                     ("keyword_tf", keyword_tf),
                     ("wordcount", wordcount)]:
        secs, val = t(fn)
        results[name] = secs
        print(f"{name}: {secs:.2f}s (result={val})")
    print(f"total: {sum(results.values()):.2f}s")

if __name__ == "__main__":
    main(sys.argv[1])
