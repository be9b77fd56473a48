#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only — the
shipped Scala library has no Python dependency).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query in <outDir>/oracle_sql.json: run the oracle SQL in DuckDB
over the fixture parquet, read the Spark result parquet, sort columns by
name, and compare values exactly (row order must match — every query is
expected to end in a total ORDER BY).
"""
import os, sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    # Results are compared in each query's explicit ORDER BY order, so
    # insertion-order preservation buys nothing — and at sf1-class volume
    # it forces DuckDB to materialize (and spill) the 173M-row LSH
    # candidate intermediates that a streaming plan filters down to ~100k
    # rows (dedup_embedding_canonical died on disk with the default).
    con.execute("SET preserve_insertion_order=false")
    # Half the box's 32 threads: per-thread pipeline buffers drive peak
    # spill, and at 32 threads the sf1 LSH-verify stage overshoots the
    # 79 GB temp ceiling that 16 threads clears (~60 GB transient).
    # Env-overridable for the heavyweight sf1 runs, where threads=8 +
    # memory_limit=112GB trades 2x latency for the last ~40 GB of temp.
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEMLIMIT', '90GB')}'")
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        # driver fixtures are single files; Spark-written fixtures (the
        # sf1-class decade sweep) are part-file directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # optional 3rd arg: "only=a,b" or "skip=a,b" query-name filter.
    # STRICT: an unknown mode or a name matching no oracle exits nonzero
    # instead of silently checking nothing / everything — a typo here
    # must never produce a vacuously green gate.
    if len(sys.argv) > 3:
        mode, _, names = sys.argv[3].partition("=")
        sel = set(n for n in names.split(",") if n)
        if mode not in ("only", "skip"):
            sys.exit(f"unknown filter mode {mode!r}: use only=a,b or skip=a,b")
        unknown = sel - set(oracle)
        if unknown:
            sys.exit(f"filter names not in oracle_sql.json: {sorted(unknown)}")
        if mode == "only":
            oracle = {k: v for k, v in oracle.items() if k in sel}
        else:
            oracle = {k: v for k, v in oracle.items() if k not in sel}
        if not oracle:
            sys.exit("filter selected zero oracles")
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark output"))
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = list(got_rel.columns)
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failures.append((name, f"schema: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"))
            n_fail += 1
            continue
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        grows = [tuple(norm(r[i]) for i in gperm) for r in got]
        erows = [tuple(norm(r[i]) for i in eperm) for r in exp]
        if len(grows) != len(erows):
            failures.append((name, f"rowcount: spark={len(grows)} oracle={len(erows)}"))
            n_fail += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(grows, erows)) if g != e), None)
        if bad is not None:
            failures.append((name, f"row {bad}: spark={grows[bad]} oracle={erows[bad]}"))
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS {name} ({len(grows)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} with oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
