package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * data skipping for range predicates over TWO columns at once.
  *
  * A single-column sort (or partitionBy) gives tight row-group min/max
  * stats on ONE column only; a 100-TB fact table queried by
  * `part BETWEEN … AND supp BETWEEN …` then scans every row group for
  * whichever dimension the layout ignored. Interleaving the bits of both
  * (16-bit grid cells each → one 32-bit Morton value) and range-
  * partitioning + sorting on that value keeps each row group inside a
  * small rectangle of the (x, y) plane, so BOTH columns' footer stats
  * are tight and the reader's row-group filter skips everything outside
  * the query box. This is the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, built here from plain Spark primitives: the
  * Morton value is a codegen'd shift/mask column chain (no UDF), the
  * layout is `repartitionByRange + sortWithinPartitions`, and the
  * "skipping" is the stock parquet reader acting on the stats the layout
  * produced — nothing custom at read time.
  *
  * The grid quantization uses double math (monotone); layout quality is
  * all it affects — query RESULTS are exact regardless, which is why the
  * gate oracle can run the same SQL on the unclustered original.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` onto even bit positions (0,2,…,30) —
    * the standard mask ladder, plain shift/AND arithmetic that stays
    * inside whole-stage codegen. */
  private def spread16(c: Column): Column = {
    var v = c
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** Quantize onto the 16-bit grid given corpus min/max (two driver
    * scalars from one stats pass — the ANALYZE-sized collect every
    * clustering writer pays once per layout job). */
  private def grid16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - mn) / (mx - mn) * 65536.0).cast("bigint"))

  /** Morton value of two grid coordinates: x on even bits, y on odd. */
  private def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Min/max of the two cluster columns — the one stats pass every
    * clustering job pays. None when the table is empty (or the columns
    * are all-NULL): there is nothing to order. Exposed so callers that
    * also need the bounds (the census probe's query box) scan once. */
  def bounds(df: DataFrame, cx: String, cy: String)
      : Option[(Double, Double, Double, Double)] = {
    val mm = df.agg(
      min(col(cx)).cast("double"), max(col(cx)).cast("double"),
      min(col(cy)).cast("double"), max(col(cy)).cast("double")).first()
    if (mm.isNullAt(0) || mm.isNullAt(2)) None
    else Some((mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3)))
  }

  /** Cluster `df` on the Morton curve over (`cx`, `cy`) into `files`
    * range partitions: one stats pass (min/max of the two columns,
    * skipped when `precomputed` carries it), one range shuffle, a
    * per-partition sort; the Morton column never reaches the output.
    * Content is row-for-row the input — only the physical order
    * changes — so any writer (parquet path here, the session's COW
    * snapshot publish in VACUUM FULL … ZORDER BY) can consume it
    * unchanged. Non-numeric cluster columns refuse loudly (their
    * double cast would be all-NULL and silently skip clustering); an
    * EMPTY table passes through — no rows have no order. */
  def cluster(df: DataFrame, cx: String, cy: String, files: Int,
      precomputed: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    Seq(cx, cy).foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"ZORDER column $c must be numeric, is ${df.schema(c).dataType.sql}")
    }
    precomputed.orElse(bounds(df, cx, cy)) match {
      case None => df
      case Some((xLo, xHi, yLo, yHi)) =>
        // collision-proof key column: a user table may legally own "__z",
        // and withColumn would CLOBBER it before drop removed it
        var zName = "__z"
        while (df.columns.contains(zName)) zName += "_"
        df.withColumn(zName,
            morton(grid16(col(cx), xLo, xHi), grid16(col(cy), yLo, yHi)))
          .repartitionByRange(files, col(zName))
          .sortWithinPartitions(col(zName))
          .drop(zName)
    }
  }

  /** [[cluster]] + parquet write to `path`. */
  def writeClustered(df: DataFrame, cx: String, cy: String,
      path: String, files: Int): Unit =
    cluster(df, cx, cy, files).write.mode("overwrite").parquet(path)

  /** Row-group footer census for a 2-D box predicate: (total row groups,
    * row groups whose [min,max] × [min,max] stats box INTERSECTS the
    * query box) over all parquet files under `path`. The second number
    * is exactly what the stock reader must scan — its stats filter skips
    * the rest — so (hit / total) measured here IS the layout's skipping,
    * read from the same footers the reader consults. Both columns must
    * be INT64 with stats (the fixture fact columns). Driver-side footer
    * reads: metadata-sized, the same work any table format's stats
    * pruning does at plan time. */
  def rowGroupBoxCensus(spark: SparkSession, path: String,
      cx: String, loX: Long, hiX: Long,
      cy: String, loY: Long, hiY: Long): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    var total = 0
    var hit = 0
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        def range(name: String): (Long, Long) = {
          val c = b.getColumns.asScala.find(_.getPath.toDotString == name)
            .getOrElse(sys.error(s"no column $name in $path footer"))
          val st: org.apache.parquet.column.statistics.Statistics[_] =
            c.getStatistics
          require(st != null && st.hasNonNullValue, s"no stats for $name")
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        val (xMin, xMax) = range(cx)
        val (yMin, yMax) = range(cy)
        if (xMax >= loX && xMin <= hiX && yMax >= loY && yMin <= hiY) hit += 1
      } finally r.close()
    }
    (total, hit)
  }
}
