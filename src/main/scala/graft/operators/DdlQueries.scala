package graft.operators

import java.nio.file.Files
import graft.{Q, QueryPack}
import graft.sqlfront.GraftSession
import org.apache.spark.sql.functions._

/** End-to-end DDL/DML exercise surfaced through the driver's correctness
  * gate (SURVEY §2.10). The script's final state is fully determined, so
  * the oracle is a literal VALUES relation — DuckDB verifies the engine's
  * create/insert/update/delete/matview pipeline produced exactly the
  * expected rows.
  */
object DdlQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    Q(
      "ddl_dml_roundtrip",
      """SELECT * FROM (VALUES
        |  (1, 'ann', CAST(150.0 AS DOUBLE), 2),
        |  (3, 'cat', CAST(110.0 AS DOUBLE), 1)
        |) t(id, name, balance, orders)
        |ORDER BY id""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE accounts (id INT PRIMARY KEY, name TEXT NOT NULL, balance DOUBLE);
        CREATE TABLE ord (oid SERIAL, account_id INT REFERENCES accounts(id));
        INSERT INTO accounts VALUES (1, 'ann', 100.0), (2, 'bob', 50.0), (3, 'cat', 60.0);
        INSERT INTO ord (account_id) VALUES (1), (1), (3);
        UPDATE accounts SET balance = balance + 50 WHERE balance >= 60;
        DELETE FROM accounts WHERE name = 'bob';
      """)
      gs.sql("""SELECT a.id, a.name, a.balance, count(o.oid) AS orders
               |FROM accounts a JOIN ord o ON a.id = o.account_id
               |GROUP BY a.id, a.name, a.balance
               |ORDER BY a.id""".stripMargin)
        .select(col("id"), col("name"), col("balance"), col("orders").cast("int").as("orders"))
    },

    // MERGE (PG 15 statement; PG 17 NOT MATCHED BY SOURCE): a full
    // four-arm sync — conditional DELETE, ordered clause choice, insert
    // of new keys, stale-marking of rows absent from the source — whose
    // final state is fully determined, verified as a literal relation.
    Q(
      "ddl_merge",
      """SELECT * FROM (VALUES
        |  (1, 110, false),
        |  (3, 30, false),
        |  (4, 40, true)
        |) t(id, bal, stale)
        |ORDER BY id""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE bal (id INT PRIMARY KEY, bal INT, stale BOOLEAN);
        CREATE TABLE feed (id INT PRIMARY KEY, amt INT);
        INSERT INTO bal VALUES (1, 100, false), (2, 10, false), (4, 40, false);
        INSERT INTO feed VALUES (1, 10), (2, -10), (3, 30);
        MERGE INTO bal b USING feed f ON b.id = f.id
        WHEN MATCHED AND b.bal + f.amt <= 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET bal = b.bal + f.amt
        WHEN NOT MATCHED THEN INSERT VALUES (f.id, f.amt, false)
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET stale = true;
      """)
      gs.sql("SELECT id, bal, stale FROM bal ORDER BY id")
    },

    // ALTER TABLE ADD CONSTRAINT enforcement (reference
    // kv/KvQueryExecutor.java:2877-3153): FK and UNIQUE added post-hoc
    // must reject violating inserts while accepting valid ones; the final
    // table state is fully determined.
    Q(
      "ddl_alter_constraint",
      """SELECT * FROM (VALUES
        |  (1, 10, 'ok'),
        |  (2, 20, 'ok2')
        |) t(id, pid, v)
        |ORDER BY id""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE par (id INT PRIMARY KEY);
        CREATE TABLE ch (id INT PRIMARY KEY, pid INT, v TEXT);
        INSERT INTO par VALUES (10), (20);
        INSERT INTO ch VALUES (1, 10, 'ok');
        ALTER TABLE ch ADD CONSTRAINT ch_fk FOREIGN KEY (pid) REFERENCES par (id);
        ALTER TABLE ch ADD CONSTRAINT ch_u UNIQUE (v);
      """)
      def rejected(sql: String): Boolean =
        try { gs.sql(sql); false } catch { case _: IllegalArgumentException => true }
      require(rejected("INSERT INTO ch VALUES (9, 99, 'x')"), "orphan FK accepted")
      require(rejected("INSERT INTO ch VALUES (9, 10, 'ok')"), "duplicate UNIQUE accepted")
      gs.sql("INSERT INTO ch VALUES (2, 20, 'ok2')")
      gs.sql("SELECT id, pid, v FROM ch ORDER BY id")
    },

    // Incremental matview refresh: rows inserted after materialization
    // reach the view through the checkpointed streaming path (only new
    // part-files are read), and the refreshed state is fully determined.
    Q(
      "ddl_matview_incremental",
      """SELECT * FROM (VALUES
        |  ('a', CAST(3 AS BIGINT), CAST(8.0 AS DOUBLE)),
        |  ('b', CAST(2 AS BIGINT), CAST(7.0 AS DOUBLE))
        |) t(kind, n, total)
        |ORDER BY kind""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE ev (id INT PRIMARY KEY, kind TEXT, amt DOUBLE);
        INSERT INTO ev VALUES (1,'a',1.0), (2,'a',2.0), (3,'b',3.0);
        CREATE MATERIALIZED VIEW evagg AS
          SELECT kind, count(*) AS n, sum(amt) AS total FROM ev GROUP BY kind;
        INSERT INTO ev VALUES (4,'b',4.0), (5,'a',5.0);
        REFRESH MATERIALIZED VIEW evagg INCREMENTALLY;
      """)
      gs.sql("SELECT kind, n, total FROM evagg ORDER BY kind")
    },

    // PG-dialect JSON operators through the session's pre-rewrite
    // (SURVEY §4.3.1; reference kv/KvQueryExecutor.java:3159-3211) — the
    // oracle uses DuckDB's native json functions on the same literals.
    Q(
      "ddl_pg_json_ops",
      """SELECT * FROM (VALUES
        |  (1, 'v1', '7'),
        |  (2, 'v2', '9')
        |) t(id, k, nx)
        |ORDER BY id""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE ej (id INT PRIMARY KEY, props JSON);
        INSERT INTO ej VALUES (1, '{"k": "v1", "n": {"x": 7}}'), (2, '{"k": "v2", "n": {"x": 9}}');
      """)
      gs.sql("SELECT id, props->>'k' AS k, props#>>'{n,x}' AS nx FROM ej ORDER BY id")
    },

    // Transactional session semantics (reference
    // kv/KvTransactionCoordinator.java:221-664, exercised by
    // kv/TransactionAtomicityTest.java): INSERT+UPDATE+DELETE inside
    // BEGIN…ROLLBACK must leave the pre-txn snapshots untouched, and a
    // following BEGIN…COMMIT must stick. Catalog-version snapshot restore
    // — no 2PC, single-session scope.
    Q(
      "ddl_txn_rollback",
      """SELECT * FROM (VALUES
        |  (1, CAST(100.0 AS DOUBLE)),
        |  (2, CAST(50.0 AS DOUBLE)),
        |  (9, CAST(9.0 AS DOUBLE))
        |) t(id, bal)
        |ORDER BY id""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE acct (id INT PRIMARY KEY, bal DOUBLE);
        INSERT INTO acct VALUES (1, 100.0), (2, 50.0);
        BEGIN;
        INSERT INTO acct VALUES (3, 75.0);
        UPDATE acct SET bal = bal - 40 WHERE id = 1;
        DELETE FROM acct WHERE id = 2;
        ROLLBACK;
        BEGIN;
        INSERT INTO acct VALUES (9, 9.0);
        COMMIT;
      """)
      gs.sql("SELECT id, bal FROM acct ORDER BY id")
    },

    // UPSERT — the reference's own grammar doc ranks INSERT … ON CONFLICT
    // its top unimplemented statement (docs/SQL_GRAMMAR.md:715).
    // Accumulate-merge on conflict, conditional WHERE leaving the losing
    // row untouched, DO NOTHING arbitrating all unique keys; the fully
    // determined end state is the oracle (DdlDmlSpec holds the richer
    // behavioural assertions: EXCLUDED refs, double-hit rejection,
    // RETURNING).
    Q(
      "ddl_upsert",
      """SELECT * FROM (VALUES
        |  ('a', 12, CAST(1.5 AS DOUBLE)),
        |  ('b', 3, CAST(2.0 AS DOUBLE)),
        |  ('c', 9, CAST(3.0 AS DOUBLE)),
        |  ('d', 1, CAST(0.5 AS DOUBLE)),
        |  ('e', 4, CAST(4.0 AS DOUBLE))
        |) t(sku, qty, price)
        |ORDER BY sku""".stripMargin
    ) { (s, _) =>
      val gs = new GraftSession(s, Files.createTempDirectory("graft_gate"))
      gs.sql("""
        CREATE TABLE inv (sku TEXT PRIMARY KEY, qty INT, price DOUBLE);
        INSERT INTO inv VALUES ('a', 5, 1.0), ('b', 3, 2.0);
        INSERT INTO inv VALUES ('a', 7, 1.5), ('c', 9, 3.0)
          ON CONFLICT (sku) DO UPDATE SET qty = qty + EXCLUDED.qty, price = EXCLUDED.price;
        INSERT INTO inv VALUES ('b', 100, 9.9), ('d', 1, 0.5)
          ON CONFLICT (sku) DO UPDATE SET qty = EXCLUDED.qty WHERE EXCLUDED.qty < 50;
        INSERT INTO inv VALUES ('a', 0, 0.0), ('e', 4, 4.0) ON CONFLICT DO NOTHING;
      """)
      gs.sql("SELECT sku, qty, price FROM inv ORDER BY sku")
    }
  )
}
