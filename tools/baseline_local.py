#!/usr/bin/env python3
"""Local single-node baseline for the headline queries (VERDICT r3 #4).

BASELINE.json publishes no timing numbers, so the bench-vs-baseline
criterion has been incomputable. This harness produces a local,
like-for-like baseline: each headline query's DuckDB oracle SQL (the
exact semantic twin the correctness gate already compares against)
timed over the SAME sf parquet tables, on the same machine, with the
same core budget DuckDB defaults to (all cores; Spark runs local[32]).

Usage:
  python3 tools/baseline_local.py [sfDir] [oracleSqlJson] [outJson] [benchJson]

benchJson is the SPARK board the like-for-like headline sums (default
bench_full.json); the headline block records the path it ACTUALLY
read as "spark_bench" — VERDICT r12 found a stale default label after
a later run overwrote bench_full.json, so the source of the 39.788 s
total was misattributed. Pass the round-stamped board explicitly
(e.g. bench_sf01_r13.json) so the audit trail names the right file.

Defaults: /root/testdata/sf0.1, target/verify_local/oracle_sql.json
(written by `sbt "runMain graft.Verify ..."`), BASELINE_LOCAL.json.

Timing protocol mirrors graft.Bench: one warmup pass, then the min of
two measured passes (min is the right statistic on a VM with
scheduling jitter). Results are fully materialized (fetchall) so lazy
relations can't undercount.
"""
import sys, json, os, time
import duckdb

# r4: time EVERY oracle twin, not just the original 6-query headline —
# the full bench board is in bench_full.json now, so bench-vs-baseline
# is computable per query across the whole oracle-checked surface.
# (Oracles are derived purely from the base parquet tables; none
# reference scratch files.)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = (sys.argv[2] if len(sys.argv) > 2
                   else "target/verify_local/oracle_sql.json")
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_LOCAL.json"
    with open(oracle_path) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = {}
    total = 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        con.sql(sql).fetchall()  # warmup (buffer cache, JIT-ish paths)
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            rows = con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        total += best
        print(f"[baseline] {name}: {best:.3f}s ({len(rows)} rows)")

    out = {
        "engine": f"duckdb-{duckdb.__version__}",
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "sf": sf_dir,
        "protocol": "warmup + min-of-2, fully materialized",
        "metric": "total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
    }
    # Host-phase anchor (VERDICT r11 #8): in-artifact comparability
    # evidence, mirroring graft.Bench's phase_anchor field.
    if "dedup_ngram_jaccard" in queries:
        out["phase_anchor"] = {"query": "dedup_ngram_jaccard",
                               "sec": queries["dedup_ngram_jaccard"]}

    # r10 (VERDICT r9 #10): state the like-for-like headline IN the
    # baseline JSON, with its exclusion list, so the criterion is
    # auditable from one file. Exclusions are the standing principle:
    # csv_*/jsonl/fw upload rows (fixture-file synthesis vs a ~1 ms
    # SELECT over a pre-loaded table) and the scale10 ASYMMETRIC set
    # (a served artifact vs a from-raw recompute, a build vs a COUNT,
    # a sketch vs an exact plan).
    bench_path = sys.argv[4] if len(sys.argv) > 4 else "bench_full.json"
    if os.path.exists(bench_path):
        import importlib.util as _ilu
        _spec = _ilu.spec_from_file_location(
            "scale10", os.path.join(os.path.dirname(__file__), "scale10.py"))
        _s10 = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_s10)
        sp = json.load(open(bench_path)).get("queries", {})
        excluded_upload = sorted(
            k for k in sp if k.startswith(("csv_", "jsonl", "fw_")))
        excluded_asym = sorted(k for k in sp if k in _s10.ASYMMETRIC)
        shared = [k for k in sp
                  if k in queries and queries[k] > 0 and sp[k] > 0
                  and k not in excluded_upload and k not in excluded_asym]
        s_tot = sum(sp[k] for k in shared)
        d_tot = sum(queries[k] for k in shared)
        out["headline_like_for_like"] = {
            "spark_bench": bench_path,
            "rows": len(shared),
            "spark_sec": round(s_tot, 3),
            "duckdb_sec": round(d_tot, 3),
            "ratio": round(s_tot / d_tot, 2) if d_tot else None,
            "excluded_upload_rows": excluded_upload,
            "excluded_asymmetric_rows": excluded_asym,
        }
        print(f"[baseline] like-for-like headline: {len(shared)} rows, "
              f"spark {s_tot:.1f}s vs duckdb {d_tot:.1f}s = "
              f"{s_tot / d_tot:.2f}x")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
