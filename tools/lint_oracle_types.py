#!/usr/bin/env python3
"""Oracle type lint (dev tooling only — the shipped Scala library has no
Python dependency).

The driver's correctness gate hashes values TYPE-SENSITIVELY, so an oracle
that returns HUGEINT (DuckDB's type for bare SUM(BIGINT) or `//`) against a
Spark BIGINT column hash-mismatches even when every value is equal. This
lint catches that class of red before the gate does.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/lint_oracle_types.py <sfDir> <outDir>

For each query in <outDir>/oracle_sql.json: DESCRIBE the oracle SQL in
DuckDB and DESCRIBE the Spark result parquet, then require the column types
to agree per column name under a small equivalence map (DECIMAL widths and
VARCHAR lengths are ignored; HUGEINT never matches anything Spark writes,
so it is always an error).
"""
import os, sys, json, glob, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(t):
    t = t.upper()
    t = re.sub(r"DECIMAL\(\d+,\s*\d+\)", "DECIMAL", t)
    t = re.sub(r"VARCHAR\(\d+\)", "VARCHAR", t)
    # Parquet logical-type spellings duckdb may emit for Spark output.
    t = {"INT64": "BIGINT", "INT32": "INTEGER", "INT16": "SMALLINT",
         "INT8": "TINYINT", "FLOAT": "REAL", "STRING": "VARCHAR",
         "TEXT": "VARCHAR", "TIMESTAMP_NS": "TIMESTAMP",
         "TIMESTAMP WITH TIME ZONE": "TIMESTAMP"}.get(t, t)
    t = re.sub(r"\bINT64\b", "BIGINT", t)
    t = re.sub(r"\bINT32\b", "INTEGER", t)
    # The driver compares via pandas, which upcasts every <=64-bit integer
    # to int64 — width differences inside the int family never fail the
    # gate, so they are not lint errors. HUGEINT (128-bit) is the one
    # integer type pandas CANNOT hold as int64 (it becomes object/float,
    # changing the hash) — keep it distinct so it always mismatches.
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT-FAMILY"
    return t


def describe_types(con, sql):
    rows = con.sql(f"DESCRIBE {sql}").fetchall()
    return {r[0]: canon(r[1]) for r in rows}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        # driver fixtures are single files; Spark-written fixtures (the
        # sf1-class decade sweep) are part-file directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        try:
            exp = describe_types(con, f"({sql})")
        except Exception as e:
            failures.append((name, f"oracle DESCRIBE error: {e}"))
            n_fail += 1
            continue
        hug = [c for c, t in exp.items() if "HUGEINT" in t]
        if hug:
            failures.append((name, f"oracle returns HUGEINT for {hug} "
                             "(bare SUM(BIGINT) or `//`?) — add CAST(... AS BIGINT)"))
            n_fail += 1
            continue
        if not files:
            # No Spark output to compare against (e.g. lint run before
            # Verify, or a session-suite query) — HUGEINT check still ran.
            n_pass += 1
            continue
        try:
            got = describe_types(con, f"(SELECT * FROM read_parquet({files!r}))")
        except Exception as e:
            failures.append((name, f"parquet DESCRIBE error: {e}"))
            n_fail += 1
            continue
        mismatches = []
        for c in sorted(set(exp) | set(got)):
            a, b = got.get(c), exp.get(c)
            if a is None or b is None:
                mismatches.append(f"{c}: spark={a} oracle={b}")
            elif a != b:
                mismatches.append(f"{c}: spark={a} oracle={b}")
        if mismatches:
            failures.append((name, "; ".join(mismatches)))
            n_fail += 1
        else:
            n_pass += 1
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"{n_pass} pass / {n_fail} fail of {len(oracle)} oracles")
    sys.exit(1 if n_fail else 0)


main()
