package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY "Partitioning & shuffle": salting for
  * skew). AQE's skew-join handles sort-merge cases adaptively; this
  * helper is the explicit technique for when a handful of hot keys would
  * otherwise pin a single reducer — the fact side gets a random salt in
  * [0, buckets), the dimension side is replicated across every salt value,
  * and the join key becomes (key, salt), spreading each hot key over
  * `buckets` reducers. Results are exactly those of the unsalted join.
  */
object SkewJoin {

  /** Equi-join `fact.key = dim.key` with the dimension replicated over
    * `buckets` salt values. `joinType` as in DataFrame.join (inner/left). */
  def salted(
      fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val saltedFact = fact.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
