package graft.streaming

import java.nio.file.{Files, Path}
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StructField, StructType}

import graft.sqlfront.{GraftSession, PgRewrite, TypeMap}

/** Incremental materialized-view maintenance — the Spark-native analogue
  * of the reference's scheduled refresh job
  * (kv/jobs/MaterializedViewRefreshJob.java +
  * kv/jobs/BackgroundJobScheduler.java, which re-run the view SQL from
  * scratch on a timer and row-copy the result through the driver).
  *
  * Here the base table's snapshot directory is consumed as a Structured
  * Streaming FILE SOURCE: part-files appended by INSERT/COPY arrive as
  * micro-batches, the view SQL re-evaluates against streaming aggregation
  * STATE (only the new rows are read — never a rescan of processed
  * files), and each batch publishes the full current result to the
  * matview directory. The file-source log + aggregation state live in a
  * per-view checkpoint under the warehouse, so repeated one-shot
  * refreshes stay incremental across calls — `REFRESH MATERIALIZED VIEW v
  * INCREMENTALLY` only ever pays for rows inserted since the last call.
  *
  * UPDATE/DELETE/TRUNCATE publish a NEW snapshot dir (copy-on-write), so
  * the checkpoint records the base-table version it was built against; on
  * drift the checkpoint resets and the new snapshot streams from scratch
  * (still incremental thereafter). Views whose SQL a streaming plan can't
  * express (no aggregate, LIMIT, …) fall back to a full recompute.
  */
object MatviewMaintenance {

  private val fromRe = """(?is).*?\bFROM\s+([\w"]+).*""".r

  /** One incremental refresh of matview `name`; returns the number of new
    * base-table rows processed (0 = matview was already current). Falls
    * back to a full [[GraftSession.materialize]] when the view SQL has no
    * single resolvable base table or isn't streamable. */
  def refreshOnce(gs: GraftSession, name: String): Long = {
    val spark = gs.spark
    val v = gs.catalog.views(name.toLowerCase)
    require(v.materialized, s"$name is not materialized")
    val baseOpt = v.sql match {
      case fromRe(t) => gs.catalog.getTable(t.replaceAll("\"", "").toLowerCase)
      case _ => None
    }
    val t = baseOpt.getOrElse { gs.materialize(v); return -1L }

    val ckptRoot = gs.catalog.root.resolve("_ckpt_" + v.name)
    // checkpoint validity is tied to the snapshot dir it streams from
    val marker = ckptRoot.resolve("_basever")
    if (Files.exists(marker) && Files.readString(marker).trim != t.version.toString)
      deleteRec(ckptRoot)
    Files.createDirectories(ckptRoot)
    Files.writeString(marker, t.version.toString)

    val dir = gs.catalog.tableDir(t)
    Files.createDirectories(dir)
    val schema = StructType(t.columns.map(c =>
      StructField(c.name, TypeMap.toSpark(c.sqlType), nullable = true)))

    // batch views for any other tables the SQL joins, then shadow the base
    // table with its streaming twin — same SQL, incremental plan
    gs.registerAll()
    spark.readStream.schema(schema).parquet(dir.toString)
      .select(t.visibleColumns.map(c => org.apache.spark.sql.functions.col(c.name)): _*)
      .createOrReplaceTempView(t.name)
    val target = gs.catalog.matviewDir(v).toString
    try {
      val agg = spark.sql(PgRewrite.rewrite(v.sql))
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", ckptRoot.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(target)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      q.recentProgress.map(_.numInputRows).sum
    } catch {
      case NonFatal(_) =>
        // not streamable (or the stream failed): full recompute is always
        // correct, and the stale checkpoint must not mask the fresh state
        deleteRec(ckptRoot)
        gs.materialize(v)
        -1L
    } finally {
      gs.registerAll() // restore the batch temp view over the base table
    }
  }

  /** Continuous background maintenance — the analogue of the reference's
    * BackgroundJobScheduler + MaterializedViewRefreshJob pair, but push-
    * based: a long-running streaming query that picks up every appended
    * part-file within one trigger interval and republishes the matview,
    * instead of a timer that re-runs the full SELECT. Share the same
    * checkpoint as [[refreshOnce]], so one-shot and background refreshes
    * can interleave. Caller owns the returned query's lifecycle. */
  def continuous(gs: GraftSession, name: String,
      triggerInterval: String = "5 seconds"): StreamingQuery = {
    val spark = gs.spark
    val v = gs.catalog.views(name.toLowerCase)
    require(v.materialized, s"$name is not materialized")
    val t = (v.sql match {
      case fromRe(b) => gs.catalog.getTable(b.replaceAll("\"", "").toLowerCase)
      case _ => None
    }).getOrElse(throw new IllegalArgumentException(
      s"cannot maintain $name continuously: no single base table in its SQL"))
    val ckptRoot = gs.catalog.root.resolve("_ckpt_" + v.name)
    val marker = ckptRoot.resolve("_basever")
    if (Files.exists(marker) && Files.readString(marker).trim != t.version.toString)
      deleteRec(ckptRoot)
    Files.createDirectories(ckptRoot)
    Files.writeString(marker, t.version.toString)
    val dir = gs.catalog.tableDir(t)
    Files.createDirectories(dir)
    val schema = StructType(t.columns.map(c =>
      StructField(c.name, TypeMap.toSpark(c.sqlType), nullable = true)))
    gs.registerAll()
    spark.readStream.schema(schema).parquet(dir.toString)
      .select(t.visibleColumns.map(c => org.apache.spark.sql.functions.col(c.name)): _*)
      .createOrReplaceTempView(t.name)
    val target = gs.catalog.matviewDir(v).toString
    val agg = spark.sql(PgRewrite.rewrite(v.sql))
    agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckptRoot.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(target)
      }
      .start()
  }

  private def deleteRec(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try {
      s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    } finally s.close()
  }
}
