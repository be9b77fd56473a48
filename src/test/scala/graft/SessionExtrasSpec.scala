package graft

import java.nio.file.Files
import graft.sqlfront.GraftSession

/** Introspection, COPY bulk load, and time-travel reads. */
class SessionExtrasSpec extends SparkSpec {

  private def fresh(): GraftSession =
    new GraftSession(spark, Files.createTempDirectory("graft_wh"))

  test("SHOW TABLES lists catalog objects with kinds") {
    val s = fresh()
    s.sql("""CREATE TABLE t1 (id INT PRIMARY KEY);
             CREATE VIEW v1 AS SELECT * FROM t1;
             CREATE SEQUENCE sq1;
             CREATE TYPE col AS ENUM ('red','blue')""")
    val m = s.sql("SHOW TABLES").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("t1") == "table" && m("v1") == "view" &&
      m("sq1") == "sequence" && m("col") == "enum")
  }

  test("DESCRIBE shows declared types and constraint flags") {
    val s = fresh()
    s.sql("CREATE TABLE parent (id INT PRIMARY KEY); " +
      "CREATE TABLE t (id SERIAL PRIMARY KEY, name TEXT NOT NULL, pid INT REFERENCES parent(id))")
    val d = s.sql("DESCRIBE t").collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(d("id").contains("PK") && d("id").contains("SERIAL"))
    assert(d("name").contains("NOT NULL"))
    assert(d("pid").contains("FK→parent(id)"))
  }

  test("COPY FROM CSV goes through validation; COPY TO round-trips") {
    val s = fresh()
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, name TEXT NOT NULL, score DOUBLE)")
    val csv = Files.createTempDirectory("graft_csv").resolve("in.csv")
    Files.writeString(csv, "id,name,score\n1,ann,1.5\n2,bob,2.5\n")
    s.sql(s"COPY t FROM '$csv' (FORMAT CSV, HEADER)")
    assert(s.sql("SELECT count(*) AS c FROM t").collect()(0).getLong(0) == 2)
    // constraint path still active: duplicate PK in a second load is rejected
    assertThrows[IllegalArgumentException](s.sql(s"COPY t FROM '$csv' (FORMAT CSV, HEADER)"))
    val out = Files.createTempDirectory("graft_csv").resolve("out")
    s.sql(s"COPY t TO '$out' (FORMAT CSV, HEADER)")
    val back = spark.read.option("header", true).csv(out.toString)
    assert(back.count() == 2 && back.columns.toSeq == Seq("id", "name", "score"))
  }

  test("COPY FROM JSON loads through validation") {
    val s = fresh()
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, name TEXT NOT NULL)")
    val f = Files.createTempDirectory("graft_json").resolve("in.json")
    Files.writeString(f, "{\"id\": 1, \"name\": \"ann\"}\n{\"id\": 2, \"name\": \"bob\"}\n")
    s.sql(s"COPY t FROM '$f' (FORMAT JSON)")
    assert(s.sql("SELECT count(*) AS c FROM t").collect()(0).getLong(0) == 2)
  }

  test("INSERT INTO ... SELECT goes through validation and appends") {
    val s = fresh()
    s.sql("CREATE TABLE src (id INT PRIMARY KEY, v DOUBLE); " +
      "CREATE TABLE dst (id INT PRIMARY KEY, v DOUBLE)")
    s.sql("INSERT INTO src VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    s.sql("INSERT INTO dst SELECT id, v FROM src WHERE v > 2")
    assert(s.sql("SELECT id FROM dst ORDER BY id").collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    // PK conflict on re-insert is caught
    assertThrows[IllegalArgumentException](s.sql("INSERT INTO dst SELECT id, v FROM src WHERE v > 2"))
  }

  test("VERSION() and system functions answer through the rewrite") {
    val s = fresh()
    val v = s.sql("SELECT VERSION() AS v").collect()(0).getString(0)
    assert(v.contains("Spark"))
  }

  test("pg_catalog emulation answers pg_class/pg_attribute queries") {
    val s = fresh()
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, name TEXT NOT NULL); " +
      "CREATE VIEW v AS SELECT id FROM t")
    val kinds = s.sql("SELECT relname, relkind FROM pg_class ORDER BY relname")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kinds("t") == "r" && kinds("v") == "v")
    val cols = s.sql("SELECT attname, atttype FROM pg_attribute " +
      "WHERE relname = 't' ORDER BY attnum").collect().map(_.getString(0)).toSeq
    assert(cols == Seq("id", "name"))
  }

  test("time travel reads prior snapshot versions after UPDATE/DELETE") {
    val s = fresh()
    s.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    s.sql("INSERT INTO t VALUES (1, 10), (2, 20)")   // version 0
    s.sql("UPDATE t SET v = v * 10 WHERE id = 2")     // publishes version 1
    s.sql("DELETE FROM t WHERE id = 1")               // publishes version 2
    assert(s.tableVersion("t", 0).collect().map(_.getInt(1)).sorted.toSeq == Seq(10, 20))
    assert(s.tableVersion("t", 1).collect().map(_.getInt(1)).sorted.toSeq == Seq(10, 200))
    assert(s.tableVersion("t", 2).collect().map(_.getInt(1)).sorted.toSeq == Seq(200))
    assertThrows[IllegalArgumentException](s.tableVersion("t", 99))
  }
}
