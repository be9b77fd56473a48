package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session; Engine
  * config mirrors Verify/Bench). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.shared
  def sf(name: String = "sf0.001"): String = s"/root/testdata/$name"
}

object SparkSpec {
  lazy val shared: SparkSession = Engine.session("graft-test")
}
