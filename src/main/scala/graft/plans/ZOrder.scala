package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * data skipping for range predicates over k columns at once.
  *
  * A single-column sort (or partitionBy) gives tight row-group min/max
  * stats on ONE column only; a 100-TB fact table queried by
  * `part BETWEEN … AND supp BETWEEN …` then scans every row group for
  * whichever dimension the layout ignored. Interleaving the bits of all
  * k cluster columns (grid cells → one ≤63-bit Morton value) and range-
  * partitioning + sorting on that value keeps each row group inside a
  * small k-rectangle of the column space, so EVERY clustered column's
  * footer stats are tight and the reader's row-group filter skips
  * everything outside the query box. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain Spark
  * primitives: the Morton value is a codegen'd shift/mask column chain
  * (no UDF), the layout is `repartitionByRange + sortWithinPartitions`,
  * and the "skipping" is the stock parquet reader acting on the stats
  * the layout produced — nothing custom at read time. A 100-TB fact
  * table is typically queried on 3-4 dimensions; bits-per-dimension
  * scales down as k grows (16·k capped at 63 total key bits) because
  * skipping power comes from the interleave, not grid resolution.
  *
  * The grid quantization uses double math (monotone); layout quality is
  * all it affects — query RESULTS are exact regardless, which is why the
  * gate oracle can run the same SQL on the unclustered original. Two
  * layout-only edge behaviors, same contract: NULL cluster-column values
  * quantize to grid cell 0 (they collect at the curve origin rather than
  * in a separate NULL range partition), and values with |magnitude| >
  * 2^53 lose low-bit precision in the double cast — neighboring rows may
  * land in adjacent cells, which loosens stats slightly but never
  * changes results. Non-numeric columns refuse loudly (their double
  * cast would be all-NULL and silently skip clustering).
  */
object ZOrder {

  /** Grid bits per dimension: 16 for k ≤ 3 (32/48-bit keys), then 63/k
    * so the interleaved key always fits a non-negative long — 15 bits at
    * k=4, 12 at k=5, 10 at k=6. Resolution loss at high k is the right
    * trade: each halving of grid bits merges adjacent cells, while the
    * interleave (what actually buys multi-column skipping) is intact. */
  private[plans] def bitsPerDim(k: Int): Int = math.min(16, 63 / k)

  /** Spread the low 16 bits of `c` onto even bit positions (0,2,…,30) —
    * the standard mask ladder, plain shift/AND arithmetic that stays
    * inside whole-stage codegen. The k=2 fast path (~10 ops vs the
    * generic loop's 32 OR terms). */
  private def spread16(c: Column): Column = {
    var v = c
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** Quantize onto a 2^bits grid given corpus min/max (driver scalars
    * from one stats pass). NULL → cell 0, explicitly (see object doc);
    * the double cast is monotone so ordering inside the grid is
    * preserved for |values| ≤ 2^53. */
  private def grid(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val cells = 1L << bits
    if (mx <= mn) lit(0L)
    else least(lit(cells - 1),
      floor((coalesce(c.cast("double"), lit(mn)) - mn) / (mx - mn) * cells)
        .cast("bigint"))
  }

  /** Morton value of k grid coordinates: bit i of dimension d lands at
    * interleaved position i·k + d. k=2 uses the mask-ladder fast path;
    * the generic chain is bits·k shift/AND/OR terms — still plain
    * codegen'd long arithmetic, just more of it. */
  private def morton(gs: Seq[Column], bits: Int): Column = gs match {
    case Seq(x, y) if bits == 16 =>
      spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
    case _ =>
      val k = gs.size
      var acc: Column = lit(0L)
      for (i <- 0 until bits; (g, d) <- gs.zipWithIndex)
        acc = acc.bitwiseOR(
          shiftleft(shiftright(g, i).bitwiseAND(lit(1L)), i * k + d))
      acc
  }

  /** Min/max of every cluster column — the one stats pass each
    * clustering job pays. None when the table is empty or ANY cluster
    * column is all-NULL: there is nothing to order on. Exposed so
    * callers that also need the bounds (the census probe's query box)
    * scan once. */
  def bounds(df: DataFrame, cols: Seq[String]): Option[Seq[(Double, Double)]] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val mm = df.agg(aggs.head, aggs.tail: _*).first()
    if (cols.indices.exists(i => mm.isNullAt(2 * i))) None
    else Some(cols.indices.map(i => (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))))
  }

  /** Cluster `df` on the Morton curve over `cols` (2 ≤ k ≤ 6) into
    * `files` range partitions: one stats pass (skipped when
    * `precomputed` carries it), one range shuffle, a per-partition
    * sort; the Morton column never reaches the output. Content is
    * row-for-row the input — only the physical order changes — so any
    * writer (parquet path here, the session's COW snapshot publish in
    * VACUUM FULL … ZORDER BY) can consume it unchanged. Non-numeric
    * cluster columns refuse loudly; an EMPTY table passes through — no
    * rows have no order. NULL values cluster at the curve origin and
    * |values| > 2^53 quantize with double precision loss — both
    * layout-only (see object doc). */
  def cluster(df: DataFrame, cols: Seq[String], files: Int,
      precomputed: Option[Seq[(Double, Double)]] = None): DataFrame = {
    require(cols.size >= 2 && cols.size <= 6,
      s"ZORDER needs 2-6 columns, got ${cols.size} (one column is a plain " +
        "sort; past six, per-dimension resolution degrades below usefulness)")
    cols.foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"ZORDER column $c must be numeric, is ${df.schema(c).dataType.sql}")
    }
    precomputed.orElse(bounds(df, cols)) match {
      case None => df
      case Some(bs) =>
        val bits = bitsPerDim(cols.size)
        // collision-proof key column: a user table may legally own "__z",
        // and withColumn would CLOBBER it before drop removed it
        var zName = "__z"
        while (df.columns.contains(zName)) zName += "_"
        val gs = cols.zip(bs).map { case (c, (lo, hi)) => grid(col(c), lo, hi, bits) }
        df.withColumn(zName, morton(gs, bits))
          .repartitionByRange(files, col(zName))
          .sortWithinPartitions(col(zName))
          .drop(zName)
    }
  }

  /** 2-D convenience overload (the original surface; VACUUM's common case). */
  def cluster(df: DataFrame, cx: String, cy: String, files: Int): DataFrame =
    cluster(df, Seq(cx, cy), files)

  /** [[cluster]] + parquet write to `path`. */
  def writeClustered(df: DataFrame, cols: Seq[String],
      path: String, files: Int): Unit =
    cluster(df, cols, files).write.mode("overwrite").parquet(path)

  def writeClustered(df: DataFrame, cx: String, cy: String,
      path: String, files: Int): Unit =
    writeClustered(df, Seq(cx, cy), path, files)

  /** Row-group footer census for a k-D box predicate: (total row groups,
    * row groups whose per-column [min,max] stats box INTERSECTS the
    * query box `boxes` = (column, lo, hi)*) over all parquet files under
    * `path`. The second number is exactly what the stock reader must
    * scan — its stats filter skips the rest — so (hit / total) measured
    * here IS the layout's skipping, read from the same footers the
    * reader consults. All census columns must be INT64 with stats (the
    * fixture fact columns). Driver-side footer reads: metadata-sized,
    * the same work any table format's stats pruning does at plan time. */
  def rowGroupBoxCensus(spark: SparkSession, path: String,
      boxes: Seq[(String, Long, Long)]): (Int, Int) = {
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
        val intersects = boxes.forall { case (name, lo, hi) =>
          val (mn, mx) = range(name)
          mx >= lo && mn <= hi
        }
        if (intersects) hit += 1
      } finally r.close()
    }
    (total, hit)
  }

  def rowGroupBoxCensus(spark: SparkSession, path: String,
      cx: String, loX: Long, hiX: Long,
      cy: String, loY: Long, hiY: Long): (Int, Int) =
    rowGroupBoxCensus(spark, path, Seq((cx, loX, hiX), (cy, loY, hiY)))
}
