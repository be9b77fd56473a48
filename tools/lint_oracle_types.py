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


# ---------------------------------------------------------------- CTE lint
#
# Two DuckDB hazards bit round 15's unrolled-loop oracles, both fixed by
# hand (commits 1312446, 84ed1ee); this mechanizes them:
#
# 1. EXPONENTIAL INLINING: a plain (non-MATERIALIZED) CTE referenced >=2
#    times is inlined per reference; in an unrolled iteration chain
#    (w_0 -> w_1 -> ... each referenced twice) the copies multiply to
#    2^iters -- at sf1 the classifier oracle spilled ~78 GB and died on
#    ENOSPC. We compute the exact evaluation count of every plain CTE
#    under inlining (materialized CTEs cut the multiplication: evaluated
#    once no matter how often referenced) and fail past a threshold.
#    The threshold (48) sits above the BFS oracle's benign ~16-31x small
#    edge-list reuse and far below the 256x corpus-sized blowup.
#
# 2. ORDERING LOSS: in DuckDB 1.0 under preserve_insertion_order=false
#    (the checker's own setting), a top-level ORDER BY on a PLAIN CTE
#    that sits atop MATERIALIZED ones streams back unordered. If a query
#    mixes materialized and plain CTEs and its final SELECT (which
#    carries the ORDER BY) reads a plain CTE whose subtree contains a
#    materialized one, the plain wrapper must be materialized too.

EVAL_COUNT_LIMIT = 48


def _strip_literals(sql):
    """Blank out '...' string literals, '--' line comments and block
    comments so CTE parsing can't be derailed by quotes or parens inside
    them (a ')' inside a comment otherwise truncates a CTE body and
    silently skips linting everything after it). One character-level
    pass, because literals and comments shadow each other's delimiters:
    '--' inside a literal is content, a quote inside a comment is not."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # literal: emit empty '' in its place
            i += 1
            while i < n:
                if sql[i] == "'" and i + 1 < n and sql[i + 1] == "'":
                    i += 2  # '' escape stays inside
                elif sql[i] == "'":
                    i += 1
                    break
                else:
                    i += 1
            out.append("''")
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":  # line comment
            while i < n and sql[i] != "\n":
                i += 1
            out.append(" ")  # comments separate tokens: 'FROM --x\na'
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":  # block comment
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")  # 'FROM/*c*/a' must not glue to 'FROMa'
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_ctes(sql):
    """Top-level WITH list -> ([(name, materialized, body)], tail_select).
    Returns (None, sql) when the query has no top-level WITH."""
    s = _strip_literals(sql)
    m = re.match(r"\s*WITH\b", s, re.I)
    if not m:
        return None, s
    i = m.end()
    ctes = []
    while True:
        head = re.compile(
            r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(MATERIALIZED\s+)?\(", re.I)
        hm = head.match(s, i)
        if not hm:
            break
        name, mat = hm.group(1), bool(hm.group(2))
        depth, j = 1, hm.end()
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        ctes.append((name.lower(), mat, s[hm.end():j - 1]))
        k = re.match(r"\s*,", s[j:])
        if not k:
            return ctes, s[j:]
        i = j + k.end()
    return ctes, s[i:]


def _refs(name, text):
    """Count TABLE-position references of `name`: directly after FROM or
    JOIN, or as a later member of a FROM comma-list. A bare word count
    would also hit alias qualifiers (`u.x`), same-named columns (`AS u`)
    and GROUP BY items — wildly overcounting re-evaluations."""
    n = re.escape(name)
    direct = len(re.findall(r"\b(?:FROM|JOIN)\s+%s\b" % n, text, re.I))
    commas = len(re.findall(
        r"\bFROM\s+[A-Za-z_]\w*(?:\s+\w+)?(?:\s*,\s*[A-Za-z_]\w*(?:\s+\w+)?)*?"
        r"\s*,\s*%s\b" % n, text, re.I))
    return direct + commas


def lint_ctes(sql):
    """Return a list of problem strings for the two CTE hazard classes."""
    ctes, tail = _parse_ctes(sql)
    if not ctes:
        return []
    problems = []
    names = [n for n, _, _ in ctes]
    mat = {n: m for n, m, _ in ctes}
    body = {n: b for n, _, b in ctes}
    # evaluation count under inlining, resolved in definition order
    # reversed (a CTE may only be referenced by LATER CTEs or the tail)
    evals = {}
    for n in reversed(names):
        total = _refs(n, tail)
        for later in names[names.index(n) + 1:]:
            occ = _refs(n, body[later])
            if occ:
                total += occ * (1 if mat[later] else evals.get(later, 1))
        evals[n] = 1 if mat[n] else max(total, 1)
        if not mat[n] and evals[n] > EVAL_COUNT_LIMIT:
            problems.append(
                f"CTE '{n}' is inlined ~{evals[n]}x (multi-referenced, not "
                "MATERIALIZED, in a reference chain) — add AS MATERIALIZED "
                "or DuckDB re-evaluates it exponentially")
    # ordering loss: a top-level ORDER BY is only reliable above
    # materialized CTEs when the tail is a bare ordered READ. Two shapes
    # go nondeterministic under preserve_insertion_order=false (both
    # measured, not theorized — each cost a flaky gate red):
    #  (a) tail reads a PLAIN CTE whose subtree holds a materialized one
    #      (the round-15 infer oracle);
    #  (b) tail aggregates (GROUP BY) directly atop a materialized CTE
    #      (the round-16 degree-histogram regression — a bare projected
    #      read of a materialized CTE keeps its ORDER BY, an aggregation
    #      atop one loses it).
    if any(mat.values()) and re.search(r"\bORDER\s+BY\b", tail, re.I):
        def subtree_has_mat(n, seen=frozenset()):
            if n in seen:
                return False
            for d in names:
                if d != n and _refs(d, body[n]):
                    if mat[d] or subtree_has_mat(d, seen | {n}):
                        return True
            return False
        for n in names:
            if not mat[n] and _refs(n, tail) and subtree_has_mat(n):
                problems.append(
                    f"top-level ORDER BY reads plain CTE '{n}' above "
                    "MATERIALIZED ones — DuckDB 1.0 drops the ordering "
                    "under preserve_insertion_order=false; materialize "
                    f"'{n}' too")
            if mat[n] and _refs(n, tail) and \
                    re.search(r"\bGROUP\s+BY\b", tail, re.I):
                problems.append(
                    f"top-level ORDER BY + GROUP BY aggregate directly atop "
                    f"MATERIALIZED CTE '{n}' — the final ordering goes "
                    "nondeterministic under preserve_insertion_order=false; "
                    "move the aggregation into a materialized CTE and make "
                    "the tail a bare ordered read")
    return problems


def selftest():
    """Seeded violations must go red; the benign shapes must stay green."""
    deep = "WITH " + ", ".join(
        (f"w{k} AS (SELECT x+1 AS x FROM w{k-1} UNION ALL "
         f"SELECT x FROM w{k-1})") if k else "w0 AS (SELECT 1 AS x)"
        for k in range(9)) + " SELECT * FROM w8"
    assert any("MATERIALIZED" in p for p in lint_ctes(deep)), \
        "seeded 2^8 inline chain must be flagged"
    fixed = deep.replace(" AS (SELECT x+1", " AS MATERIALIZED (SELECT x+1")
    assert not lint_ctes(fixed), f"materialized chain must pass: {lint_ctes(fixed)}"
    ordered = ("WITH a AS MATERIALIZED (SELECT 1 AS x), "
               "b AS (SELECT x FROM a) SELECT * FROM b ORDER BY x")
    assert any("ORDER BY" in p for p in lint_ctes(ordered)), \
        "seeded plain-over-materialized ORDER BY must be flagged"
    ordered_ok = ("WITH a AS MATERIALIZED (SELECT 1 AS x), "
                  "b AS MATERIALIZED (SELECT x FROM a) "
                  "SELECT * FROM b ORDER BY x")
    assert not lint_ctes(ordered_ok), lint_ctes(ordered_ok)
    benign = ("WITH s0 AS (SELECT 1 AS x), d1 AS (SELECT x FROM s0 UNION ALL "
              "SELECT x+1 FROM s0) SELECT * FROM d1 ORDER BY x")
    assert not lint_ctes(benign), lint_ctes(benign)
    # a ')' or quote inside a comment must not truncate CTE parsing (the
    # ordering hazard below is only visible if the comment is stripped)
    commented = ("WITH a AS MATERIALIZED (SELECT 1 AS x -- note) don't\n"
                 "), b AS (SELECT x FROM a) SELECT * FROM b ORDER BY x")
    assert any("ORDER BY" in p for p in lint_ctes(commented)), \
        "comment containing ')' must not blind the lint"
    # aggregation atop a materialized CTE with a top-level ORDER BY (the
    # round-16 degree-histogram regression); the bare ordered read passes
    aggtop = ("WITH a AS MATERIALIZED (SELECT 1 AS x) "
              "SELECT x, COUNT(*) AS n FROM a GROUP BY x ORDER BY x")
    assert any("GROUP BY" in p for p in lint_ctes(aggtop)), \
        "ordered aggregation atop a materialized CTE must be flagged"
    bare = ("WITH a AS MATERIALIZED (SELECT 1 AS x) "
            "SELECT x FROM a ORDER BY x")
    assert not lint_ctes(bare), lint_ctes(bare)
    # a stripped comment must SEPARATE tokens, not glue them — gluing
    # 'FROM/*c*/a' into 'FROMa' undercounts references and re-opens the
    # blind spot the stripper exists to close
    assert _refs("a", _strip_literals(
        "SELECT x FROM/*c*/a UNION ALL SELECT x FROM a")) == 2, \
        "block comment must not glue FROM to the table name"
    assert _refs("a", _strip_literals(
        "SELECT x FROM --c\na UNION ALL SELECT x FROM a")) == 2, \
        "line comment must not glue FROM to the table name"
    print("selftest: all seeded CTE violations flagged, benign shapes pass")


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
    if "--selftest" in sys.argv:
        selftest()
        sys.exit(0)
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
        cte_problems = lint_ctes(sql)
        if cte_problems:
            failures.append((name, "; ".join(cte_problems)))
            n_fail += 1
            continue
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


if __name__ == "__main__":
    main()
