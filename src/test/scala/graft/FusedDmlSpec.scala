package graft

import java.nio.file.Files
import graft.sqlfront.GraftSession

/** r18 observe-fused DML equivalence pins.
  *
  * Small statements validate+count+write in ONE Spark job (the metrics
  * ride the write via Dataset.observe — GraftSession.publishFused /
  * appendFused); large statements keep the classic validate-then-write
  * path. Both strategies share one definition of the validation
  * semantics (validationParts), but the execution differs (collect_set
  * vs countDistinct, staged append + rollback vs validate-first), so
  * this spec drives the SAME scripts through both and pins identical
  * final states, identical reported counts, and identical rejection
  * messages.
  */
class FusedDmlSpec extends SparkSpec {

  private def fresh(): GraftSession =
    new GraftSession(spark, Files.createTempDirectory("graft_fused"))

  /** Run `script` statement-by-statement on a fresh session, recording
    * each statement's (status-ish) outcome and the thrown message if
    * any; returns the outcomes plus the final SELECT's rows. */
  private def drive(script: Seq[String], probe: String): (Seq[String], Seq[Seq[Any]]) = {
    val s = fresh()
    val outcomes = script.map { stmt =>
      try { s.sql(stmt); "ok" }
      catch { case e: IllegalArgumentException => s"rej: ${e.getMessage}" }
    }
    val rows = s.sql(probe).collect().map(_.toSeq).toSeq
    (outcomes, rows)
  }

  private def bothWays(script: Seq[String], probe: String): Unit = {
    val fused = drive(script, probe)
    GraftSession.fusionEnabled = false
    val classic =
      try drive(script, probe) finally GraftSession.fusionEnabled = true
    assert(fused._1 == classic._1,
      s"statement outcomes diverge:\n fused  =${fused._1}\n classic=${classic._1}")
    assert(fused._2 == classic._2,
      s"final states diverge:\n fused  =${fused._2}\n classic=${classic._2}")
  }

  test("fused == classic: insert, conflict rejection order, update, delete") {
    bothWays(Seq(
      "CREATE TABLE p (id INT PRIMARY KEY)",
      "CREATE TABLE t (id INT PRIMARY KEY, pid INT REFERENCES p(id), " +
        "v TEXT NOT NULL, u TEXT UNIQUE)",
      "INSERT INTO p VALUES (10), (20)",
      "INSERT INTO t VALUES (1, 10, 'a', 'x'), (2, 20, 'b', 'y')",
      // each rejection class, in the contract's precedence order
      "INSERT INTO t VALUES (3, 10, NULL, 'z')", // row-local NOT NULL
      "INSERT INTO t VALUES (3, 99, 'c', 'z')", // FK orphan
      "INSERT INTO t VALUES (3, 10, 'c', 'q'), (3, 20, 'd', 'r')", // in-batch dup PK
      "INSERT INTO t VALUES (3, 10, 'c', 'x')", // conflict with existing UNIQUE
      // a NOT NULL + FK + dup batch must report the row-local violation
      "INSERT INTO t VALUES (4, 99, NULL, 'q'), (4, 99, NULL, 'q')",
      "INSERT INTO t VALUES (3, 10, 'c', 'z')",
      "UPDATE t SET v = v || '!' WHERE id >= 2",
      "DELETE FROM t WHERE id = 1",
      "UPDATE t SET u = 'x' WHERE id = 3", // post-image UNIQUE? (x free after delete)
      "UPDATE t SET u = 'y'" // post-image UNIQUE violation across rows
    ), "SELECT id, pid, v, u FROM t ORDER BY id")
  }

  test("fused == classic: upsert arms and merge four-arm sync") {
    bothWays(Seq(
      "CREATE TABLE inv (sku TEXT PRIMARY KEY, qty INT, price DOUBLE)",
      "INSERT INTO inv VALUES ('a', 5, 1.0), ('b', 3, 2.0)",
      "INSERT INTO inv VALUES ('a', 7, 1.5), ('c', 9, 3.0) " +
        "ON CONFLICT (sku) DO UPDATE SET qty = qty + EXCLUDED.qty, price = EXCLUDED.price",
      "INSERT INTO inv VALUES ('b', 100, 9.9), ('d', 1, 0.5) " +
        "ON CONFLICT (sku) DO UPDATE SET qty = EXCLUDED.qty WHERE EXCLUDED.qty < 50",
      "INSERT INTO inv VALUES ('a', 0, 0.0), ('e', 4, 4.0) ON CONFLICT DO NOTHING",
      // affect-twice rejection
      "INSERT INTO inv VALUES ('a', 1, 1.0), ('a', 2, 2.0) " +
        "ON CONFLICT (sku) DO UPDATE SET qty = EXCLUDED.qty",
      "CREATE TABLE feed (sku TEXT PRIMARY KEY, amt INT)",
      "INSERT INTO feed VALUES ('a', 10), ('b', -100), ('z', 30)",
      "MERGE INTO inv i USING feed f ON i.sku = f.sku " +
        "WHEN MATCHED AND i.qty + f.amt <= 0 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET qty = i.qty + f.amt " +
        "WHEN NOT MATCHED THEN INSERT VALUES (f.sku, f.amt, 0.0) " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET price = -1.0"
    ), "SELECT sku, qty, price FROM inv ORDER BY sku")
  }

  test("fused reports the same affected-row counts as classic") {
    def counts(fusion: Boolean): Seq[(String, Long)] = {
      GraftSession.fusionEnabled = fusion
      try {
        val s = fresh()
        s.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
        Seq(
          "INSERT INTO t VALUES (1, 1), (2, 2), (3, 3)",
          "UPDATE t SET v = v + 1 WHERE id >= 2",
          "INSERT INTO t VALUES (2, 0), (4, 4) ON CONFLICT DO NOTHING",
          "INSERT INTO t VALUES (3, 30), (5, 5) ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v",
          "DELETE FROM t WHERE v >= 4"
        ).map { stmt =>
          val r = s.sql(stmt).collect()(0)
          (r.getString(0), r.getLong(1))
        }
      } finally GraftSession.fusionEnabled = true
    }
    assert(counts(fusion = true) == counts(fusion = false))
  }

  test("rejected fused INSERT leaves no stage dirs and no stray part files") {
    val wh = Files.createTempDirectory("graft_fused_stage")
    val s = new GraftSession(spark, wh)
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT NOT NULL)")
    s.sql("INSERT INTO t VALUES (1, 'a')")
    val tblRoot = wh.resolve("t")
    def entries(): Seq[String] = {
      val st = Files.list(tblRoot)
      try {
        val b = Seq.newBuilder[String]
        st.forEach(p => b += p.getFileName.toString)
        b.result()
      } finally st.close()
    }
    val before = entries().sorted
    intercept[IllegalArgumentException](s.sql("INSERT INTO t VALUES (2, NULL)"))
    intercept[IllegalArgumentException](s.sql("INSERT INTO t VALUES (1, 'dup')"))
    assert(entries().sorted == before, "rejected INSERTs must not leave dirs behind")
    assert(s.sql("SELECT count(*) FROM t").collect()(0).getLong(0) == 1L)
  }

  test("RETURNING through the fused paths matches classic") {
    def ret(fusion: Boolean): Seq[Seq[Seq[Any]]] = {
      GraftSession.fusionEnabled = fusion
      try {
        val s = fresh()
        s.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
        Seq(
          "INSERT INTO t VALUES (1, 1), (2, 2) RETURNING id, v",
          "UPDATE t SET v = v * 10 WHERE id = 2 RETURNING id, v",
          "DELETE FROM t WHERE id = 1 RETURNING id, v"
        ).map(stmt =>
          s.sql(stmt).collect().map(_.toSeq).toSeq.sortBy(_.head.toString))
      } finally GraftSession.fusionEnabled = true
    }
    assert(ret(fusion = true) == ret(fusion = false))
  }
}
