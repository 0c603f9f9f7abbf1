#!/usr/bin/env python3
"""Compare two bench boards (SURVEY §6 — round-over-round variance).

Usage:
  python3 tools/bench_compare.py <old.json> <new.json> [threshold]

Accepts either a bench_full.json (one JSON object) or a driver
BENCH_r*.json (numbers recovered from its stdout `tail`). Prints
per-query ratios beyond the threshold (default 1.5x either way) and
the shared-query totals. The host VM shows ±10s scheduling jitter on
sub-second queries — trust min-of-2 protocol totals and repeated
offenders, not single-run ratios.
"""
import sys, json, re


def load(path):
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:  # driver BENCH_r*.json: parse what the tail kept
        return {k: float(v) for k, v in
                re.findall(r'"([a-z0-9_]+)":([0-9.]+)', d["tail"])}
    raise SystemExit(f"{path}: no queries or tail field")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    print(f"shared {len(shared)}  only-old {len(set(old)-set(new))}"
          f"  only-new {len(set(new)-set(old))}")
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    print(f"shared totals: {tot_old:.1f}s -> {tot_new:.1f}s"
          f"  ({tot_new/tot_old:.2f}x)")
    flagged = [(k, old[k], new[k]) for k in shared
               if old[k] > 0 and
               (new[k] / old[k] > thresh or old[k] / new[k] > thresh)]
    flagged.sort(key=lambda r: -(r[2] / r[1]))
    for k, o, n in flagged:
        tag = "SLOWER" if n > o else "faster"
        print(f"  {tag} {k:32} {o:7.2f}s -> {n:7.2f}s  ({n/o:.2f}x)")
    if not flagged:
        print(f"  no per-query change beyond {thresh}x")


if __name__ == "__main__":
    main()
