package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 contributes one `Q` to a `QueryPack`;
  * this object aggregates the packs into the driver's `queries`/`oracleSql`
  * maps. Column names and row order are kept identical between each Spark
  * plan and its DuckDB oracle (total ORDER BY everywhere).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    ScanQueries,
    ExprQueries,
    JoinQueries,
    AggQueries,
    WindowQueries,
    SetOpQueries,
    SubqueryQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    DdlQueries,
    EventQueries,
    MultimodalQueries,
    TpchQueries,
    ArrayQueries,
    TemporalQueries,
    SqlSurfaceQueries,
    GraphQueries)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.qs)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference demo's headline shape (demo-ecommerce.sh: LEFT JOIN +
    * COUNT/AVG + HAVING + ORDER BY) over the star schema. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
