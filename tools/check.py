#!/usr/bin/env python3
"""Driver-equivalent correctness check, runnable locally before commit.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Replays what the driver does with Verify.scala output: for each query
parquet dump under <verifyOutDir>, run the matching oracle SQL from
oracle_sql.json in DuckDB over the <sfDir> parquet tables, then
compare (column names, row count, and a value hash computed over rows
sorted with columns in name order).
"""
import sys, json, glob, os
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The driver's hasher routes DuckDB results through pandas, where
# DECIMAL and HUGEINT columns collapse to float64 ('498223.0') while
# Spark's parquet keeps decimal128/int64 ('498223') — so a compared
# result column of either type hash-mismatches even when values are
# equal (round-1 postmortem). Treat them as errors outright.
BANNED_TYPE_FRAGMENTS = ("DECIMAL", "HUGEINT", "INT128", "UINT64")


def banned_types(rel):
    """Column names whose declared DuckDB type the driver can't hash
    faithfully. `rel` must be a DuckDBPyRelation (con.sql(...)): its
    .types carry real type names — the DBAPI cursor description only
    reports generic codes ('NUMBER' for DECIMAL/HUGEINT/BIGINT alike)
    and would make this check dead code."""
    bad = []
    for name, typ in zip(rel.columns, rel.types):
        type_name = str(typ).upper()
        if any(frag in type_name for frag in BANNED_TYPE_FRAGMENTS):
            bad.append(f"{name}:{typ}")
    return bad


def norm(v):
    if v is None:
        return "NULL"
    # Dtype-sensitive, like the driver: a Decimal must NOT silently
    # str()-equal its integer/float twin from the other engine.
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        # con.sql returns independent relation objects (con.execute
        # returns the connection itself, whose description is
        # clobbered by the next query — aliasing both sides).
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = list(got_rel.columns)
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: no oracle ({len(got)} rows) [rows-only]")
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        bad = ([f"spark {c}" for c in banned_types(got_rel)] +
               [f"oracle {c}" for c in banned_types(exp_rel)])
        if bad:
            print(f"  ✗ {name}: driver-unhashable column type(s): "
                  f"{', '.join(bad)} — cast finals to DOUBLE/BIGINT")
            n_fail += 1
            continue
        ok_cols = sorted(got_cols) == sorted(exp_cols)
        cg, ce = canon(got, got_cols), canon(exp, exp_cols)
        if ok_cols and cg == ce:
            print(f"  ✓ {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  ✗ {name}: cols_match={ok_cols} "
                  f"spark_cols={sorted(got_cols)} oracle_cols={sorted(exp_cols)} "
                  f"rows {len(got)} vs {len(exp)}")
            diff = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            for a, b in diff:
                print(f"      spark:  {a}\n      oracle: {b}")
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
