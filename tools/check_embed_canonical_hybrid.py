#!/usr/bin/env python3
"""Hybrid independent replay of dedup_embedding_canonical for fixtures
where the full DuckDB oracle is infeasible.

The committed oracle computes connected components via a RECURSIVE CTE
that materializes ALL-PAIRS reachability. On a fixture whose near-dup
graph collapses into one giant component (the sf1-class decade fixture:
19,998 of 20,000 vectors in a single cluster), that recursion holds
O(k^2) reachability rows (~400M) with per-iteration join intermediates
in the billions — unspillable recursion state that OOMs DuckDB at any
thread/memory setting this box can offer (five documented attempts, see
BASELINE.md round-17 close addendum). The quadratic state is inherent
to the ORACLE's single-node formulation, not to the engine: the Spark
side computes the same closure with distributed hash-min label
propagation and finishes at this fixture in seconds.

This checker replays everything EXCEPT the recursion through DuckDB
unchanged, and replaces only the reachability step with an exact
equivalent:

  1. extract the oracle's own pair-discovery chain (the nested
     `WITH ... SELECT a, b FROM cpairs` — sign-LSH banding + bucket
     join + exact cosine verify) VERBATIM from the dumped
     oracle_sql.json and run it in DuckDB over the fixture;
  2. compute per-node component minima by union-find in Python — for a
     bidirectional edge set, min-over-reachable == component minimum,
     which is exactly the oracle's LEAST(u, MIN(v)) over the recursive
     closure — no tolerance, same integer ids;
  3. left-join every embeddings vec_id, emit (vec_id, cluster,
     is_canonical) ordered by vec_id, and compare EXACTLY against the
     Spark result dumped by graft.Verify.

Usage:
  python3 tools/check_embed_canonical_hybrid.py <sfDir> <outDir>
  (env: DUCKDB_THREADS, DUCKDB_MEMLIMIT as for check_oracle.py)
"""
import glob
import json
import os
import sys

try:
    import duckdb
    import pyarrow.parquet as pq
except ImportError:
    sys.exit("needs duckdb + pyarrow (driver-side tooling only)")

NAME = "dedup_embedding_canonical"


def extract_pair_sql(oracle_sql: str) -> str:
    """The oracle nests the discovery chain as `FROM (WITH ... SELECT
    a, b FROM cpairs) p` — take the inner WITH...SELECT verbatim."""
    start = oracle_sql.index("FROM (WITH ") + len("FROM (")
    end = oracle_sql.index("SELECT a, b FROM cpairs",
                           start) + len("SELECT a, b FROM cpairs")
    return oracle_sql[start:end]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1_full"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
    sql_path = f"{out}/oracle_sql.json"
    if not os.path.exists(sql_path):
        sys.exit(f"FAIL {NAME}: no {sql_path} — run graft.Verify first")
    oracle = json.load(open(sql_path))[NAME]
    pair_sql = extract_pair_sql(oracle)

    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '8')}")
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEMLIMIT', '100GB')}'")
    for t in ("embeddings",):
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    print("phase A: oracle pair CTEs in DuckDB ...", flush=True)
    pairs = con.execute(pair_sql).fetchall()
    print(f"  verified pairs: {len(pairs)}", flush=True)

    print("phase B: exact min-id closure (union-find) ...", flush=True)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    vec_ids = [r[0] for r in con.execute(
        "SELECT vec_id FROM embeddings ORDER BY vec_id").fetchall()]
    expect = [(v, find(v), v == find(v)) for v in vec_ids]

    print("phase C: exact compare vs the Spark dump ...", flush=True)
    files = sorted(glob.glob(f"{out}/{NAME}/*.parquet"))
    if not files:
        print(f"FAIL {NAME}: no Spark dump at {out}/{NAME}/*.parquet — "
              f"run graft.Verify with this query first")
        return 1
    table = pq.read_table(files[0]) if len(files) == 1 else \
        pq.concat_tables([pq.read_table(f) for f in files])
    got = sorted(zip(table.column("vec_id").to_pylist(),
                     table.column("cluster").to_pylist(),
                     table.column("is_canonical").to_pylist()))
    if got == expect:
        n_clusters = len({c for _, c, _ in expect})
        print(f"PASS {NAME}: {len(got)} rows exact-match "
              f"({n_clusters} clusters, {len(pairs)} verified pairs)")
        return 0
    diffs = [i for i, (g, e) in enumerate(zip(got, expect)) if g != e]
    print(f"FAIL {NAME}: rows {len(got)} vs {len(expect)}, "
          f"first diffs at {diffs[:5]}")
    for i in diffs[:5]:
        print(f"  got {got[i]}  expected {expect[i]}")
    # zip() truncates: when only the row COUNTS differ the overlapping
    # prefix can match and diffs be empty — show the set difference too
    only_got = set(got) - set(expect)
    only_exp = set(expect) - set(got)
    if only_got:
        print(f"  rows only in Spark dump: {sorted(only_got)[:5]}")
    if only_exp:
        print(f"  rows only in expected:   {sorted(only_exp)[:5]}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
