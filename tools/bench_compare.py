#!/usr/bin/env python3
"""Compare two bench boards (SURVEY §6 — round-over-round variance).

Usage:
  python3 tools/bench_compare.py <old.json> <new.json> [threshold]
  python3 tools/bench_compare.py --gate <old.json> <new.json>

Accepts either a bench_full.json (one JSON object) or a driver
BENCH_r*.json (numbers recovered from its stdout `tail`). Prints
per-query ratios beyond the threshold (default 1.5x either way) and
the shared-query totals. The host VM shows ±10s scheduling jitter on
sub-second queries — trust min-of-2 protocol totals and repeated
offenders, not single-run ratios.

--gate: regression gate for the headline queries (the BENCH stdout
subset) — exit 1 if any headline query regresses >30% AND >0.3s
absolute (the absolute floor keeps sub-second jitter from tripping
it), or if any previously-passing query now errors. Run it before
committing perf-sensitive changes:
  sbt "runMain graft.Bench" && \
  python3 tools/bench_compare.py --gate BENCH_r04.json bench_full.json
"""
import sys, json, re

# the Bench stdout headline subset — the queries the gate protects
HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q6_forecast_revenue", "dedup_exact", "text_token_stats",
    "csv_ingest_mixed", "q_top_orders_per_customer", "q_events_sessionize",
    "dedup_minhash", "dedup_ngram_jaccard", "dedup_clusters",
    "ann_topk_exact", "ann_pq", "ann_hnsw", "text_tfidf_top_terms",
    "curate_contamination", "pipeline_clean_corpus", "mm_frames",
    "layout_zorder"]


def load(path):
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:  # driver BENCH_r*.json: parse what the tail kept
        t = d["tail"]
        # scope the scan to the queries object so header fields
        # ("value", "queries_measured") never count as query timings
        i = t.find('"queries":{')
        if i >= 0:
            j = t.find("}", i)
            t = t[i:j if j >= 0 else len(t)]
        return {k: float(v) for k, v in
                re.findall(r'"([a-z0-9_]+)":(-?[0-9.]+)', t)
                if k not in ("value", "queries_measured")}
    raise SystemExit(f"{path}: no queries or tail field")


def gate(old, new):
    bad = []
    for k in HEADLINE:
        if k not in old:
            # an OLD board predating the query: nothing to regress from
            continue
        if k not in new:
            # a query silently vanishing from the board is itself a
            # regression — the gate must not degrade to a no-op as the
            # lists drift (HEADLINE mirrors Bench.scala's headline Seq)
            bad.append(f"MISSING {k}: present in old board, absent in new")
        elif old[k] >= 0 and new[k] < 0:
            bad.append(f"FAILED {k}: {old[k]:.2f}s -> error")
        elif old[k] > 0 and new[k] > old[k] * 1.3 and new[k] - old[k] > 0.3:
            bad.append(f"REGRESSED {k}: {old[k]:.2f}s -> {new[k]:.2f}s"
                       f" ({new[k]/old[k]:.2f}x)")
    if bad:
        print("bench regression gate FAILED:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"bench regression gate OK ({sum(1 for k in HEADLINE if k in old and k in new)} headline queries checked)")


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--gate":
        gate(load(sys.argv[2]), load(sys.argv[3]))
        return
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    # Bench writes -1 for a query that threw: the worst regression of
    # all — report it first and keep it out of the totals
    failed = sorted(k for k in set(old) & set(new)
                    if new[k] < 0 and old[k] >= 0)
    for k in failed:
        print(f"  FAILED {k:32} {old[k]:7.2f}s -> error")
    shared = sorted(k for k in set(old) & set(new)
                    if old[k] >= 0 and new[k] >= 0)
    print(f"shared {len(shared)}  only-old {len(set(old)-set(new))}"
          f"  only-new {len(set(new)-set(old))}")
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    ratio = f"  ({tot_new/tot_old:.2f}x)" if tot_old > 0 else ""
    print(f"shared totals: {tot_old:.1f}s -> {tot_new:.1f}s{ratio}")
    flagged = [(k, old[k], new[k]) for k in shared
               if old[k] > 0 and new[k] > 0 and
               (new[k] / old[k] > thresh or old[k] / new[k] > thresh)]
    flagged.sort(key=lambda r: -(r[2] / r[1]))
    for k, o, n in flagged:
        tag = "SLOWER" if n > o else "faster"
        print(f"  {tag} {k:32} {o:7.2f}s -> {n:7.2f}s  ({n/o:.2f}x)")
    # a 0.000 on either side is below the clock's resolution, not a
    # ratio — call it out instead of dividing by it
    zeros = [k for k in shared if (old[k] == 0) != (new[k] == 0)]
    for k in zeros:
        print(f"  ~zero  {k:32} {old[k]:7.3f}s -> {new[k]:7.3f}s")
    if not flagged and not failed and not zeros:
        print(f"  no per-query change beyond {thresh}x")


if __name__ == "__main__":
    main()
