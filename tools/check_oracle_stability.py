#!/usr/bin/env python3
"""Oracle DETERMINISM sweep (dev tooling, like check_oracle.py).

The correctness gate compares rows in the oracle's ORDER BY order, so an
oracle that is nondeterministic under the checker's own settings
(preserve_insertion_order=false) is a latent flaky red: it can pass one
full gate run and fail the next with identical engine output. Round 16
caught exactly that (an ordered aggregation atop a materialized CTE) —
one green run, then a red — so this sweep re-executes every oracle N
times on fresh connections and fails on ANY row-order or value drift.

Usage: python3 tools/check_oracle_stability.py <sfDir> <outDir> [N=5]
  (<outDir>/oracle_sql.json from a prior `runMain graft.Verify`.)
"""
import os, sys, json
try:
    import duckdb
except ImportError:
    # rc=3 is the SKIP contract with graft.Verify's embedded sweep: a
    # host without the duckdb module must read as "sweep unavailable",
    # never as "oracles unstable" (rc=1) — the sweep is defense in
    # depth, not a new hard dependency of the gate.
    print("SKIP: python duckdb module not available")
    sys.exit(3)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf):
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    unstable = []
    errors = []
    for name in sorted(oracle):
        ref = None
        for i in range(n):
            con = connect(sf)
            try:
                rows = con.sql(oracle[name]).fetchall()
            except Exception as e:
                errors.append((name, str(e).splitlines()[0]))
                break
            finally:
                con.close()
            if ref is None:
                ref = rows
            elif rows != ref:
                unstable.append((name, i))
                break
    for name, i in unstable:
        print(f"UNSTABLE {name}: row order/values drifted at rerun {i}")
    for name, e in errors:
        print(f"ERROR {name}: {e}")
    ok = len(oracle) - len(unstable) - len(errors)
    print(f"{ok} stable / {len(unstable)} unstable / {len(errors)} errors "
          f"of {len(oracle)} oracles x{n}")
    sys.exit(1 if (unstable or errors) else 0)


if __name__ == "__main__":
    main()
