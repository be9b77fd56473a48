package graft

/** Smoke every registered query at sf0.001: plans must build, execute, and
  * (for re-runs) be deterministic. The DuckDB oracle gate (driver-side /
  * tools/check_oracle.py) is the value-level check; this keeps `sbt test`
  * self-contained. */
class QuerySmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name builds and runs") {
      val n = fn(spark, sf()).count()
      assert(n >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and most have oracles") {
    assert(SparkEntry.queries.nonEmpty)
    val withOracle = SparkEntry.oracleSql.size
    assert(withOracle >= SparkEntry.queries.size - 2,
      s"only $withOracle/${SparkEntry.queries.size} oracle-checked")
  }
}
