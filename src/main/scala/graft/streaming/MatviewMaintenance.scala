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
  * Snapshot-drift safety: UPDATE/DELETE/TRUNCATE publish a NEW snapshot
  * dir (copy-on-write), and a joined dimension changing invalidates held
  * aggregation state even when the base table did not move — so the
  * checkpoint records the version of EVERY catalog table at build time.
  * Any drift resets the checkpoint and the new snapshots stream from
  * scratch (still incremental thereafter). A drift observed by a RUNNING
  * [[continuous]] query fails that query loudly — a background maintainer
  * must never keep publishing silently stale state. Views whose SQL a
  * streaming plan can't express (no aggregate, LIMIT, …) fall back to a
  * full recompute.
  *
  * At most one maintenance query runs per (warehouse, view): starting
  * [[continuous]] twice throws, and [[refreshOnce]] while a continuous
  * query is active simply drains that query instead of competing for its
  * checkpoint.
  */
object MatviewMaintenance {

  private val fromRe = """(?is).*?\bFROM\s+([\w"]+).*""".r

  /** Active continuous maintainers keyed by (warehouse root, view). */
  private val active =
    scala.collection.concurrent.TrieMap.empty[(String, String), StreamingQuery]

  /** Called by the session whenever a snapshot version bumps
    * (UPDATE/DELETE/TRUNCATE/DROP): stops every active maintainer on that
    * warehouse, because their file streams watch the now-superseded
    * snapshot dirs and would otherwise idle forever while the matview
    * silently diverges. The next refreshOnce/continuous call sees the
    * version-stamp mismatch, resets the checkpoint, and rebuilds from the
    * new snapshots. */
  def onSnapshotChange(root: String): Unit =
    active.filterInPlace { case ((r, _), q) =>
      if (r == root) { if (q.isActive) q.stop(); false } else true
    }

  /** Called when part-files are REMOVED from a table's current snapshot
    * dir without a version bump (transaction ROLLBACK un-appending
    * INSERT/COPY files). The base table's file listing is deliberately
    * excluded from [[versionStamp]] — appends there are what the stream
    * consumes — so a checkpoint whose file-source log already recorded a
    * now-deleted file would pass the stamp check and keep aggregation
    * state containing rolled-back rows. Removal is outside the
    * append-only contract of a file stream, so the checkpoints of every
    * view streaming from an affected base are deleted; the next refresh
    * rebuilds from the surviving files. */
  def onBaseFilesRemoved(gs: GraftSession, tables: Set[String]): Unit =
    onBaseFilesRemoved(gs.catalog, tables)

  /** Catalog-addressed variant — crash recovery runs against a database
    * root whose catalog may not be the session's live one (multi-db). */
  def onBaseFilesRemoved(cat: graft.catalog.Catalog, tables: Set[String]): Unit =
    cat.views.values.filter(_.materialized).foreach { v =>
      val base = v.sql match {
        case fromRe(t) => Some(t.replaceAll("\"", "").toLowerCase)
        case _ => None
      }
      if (base.exists(tables)) deleteRec(cat.root.resolve("_ckpt_" + v.name))
    }

  /** Called when a view is dropped or redefined (CREATE OR REPLACE):
    * stops its maintainer and removes its checkpoint, so a recreated view
    * can never inherit file-source logs or aggregation state built for
    * DIFFERENT SQL. */
  def onViewChanged(gs: GraftSession, name: String): Unit = {
    val key = (gs.catalog.root.toString, name.toLowerCase)
    active.remove(key).foreach(q => if (q.isActive) q.stop())
    deleteRec(gs.catalog.root.resolve("_ckpt_" + name.toLowerCase))
  }

  /** Validity stamp of a maintenance checkpoint: the version of every
    * catalog table (state may depend on joined dims, not just the base)
    * plus the view's own SQL — a redefinition invalidates held state even
    * when no snapshot moved. INSERT appends part-files without bumping a
    * version, so for every table EXCEPT the streamed base the stamp also
    * digests the snapshot dir's file listing: rows appended to a joined
    * dimension reset the checkpoint (held aggregation state was built
    * against the old dimension contents), while appends to the base table
    * are exactly what the file stream consumes and must NOT invalidate. */
  private def versionStamp(gs: GraftSession, v: graft.catalog.ViewDef,
      base: Option[String]): String =
    (gs.catalog.tables.values.toSeq.sortBy(_.name)
      .map { t =>
        val files =
          if (base.contains(t.name)) "" else ":" + dirDigest(gs.catalog.tableDir(t))
        s"${t.name}:${t.version}$files"
      } :+ s"sql:${v.sql.hashCode}").mkString(",")

  /** Order-independent digest of a snapshot dir's (file name, size) set. */
  private def dirDigest(p: Path): String =
    if (!Files.exists(p)) "-"
    else {
      val s = Files.list(p)
      try {
        val entries = new java.util.ArrayList[String]()
        // a file can vanish between list and size (concurrent _temporary
        // cleanup, rollback's deleteIfExists) — treat it as a digest
        // change (sentinel size) so drift still fails with the intended
        // stamp-mismatch message instead of a NoSuchFileException
        s.forEach { f =>
          val size =
            try Files.size(f)
            catch { case _: java.nio.file.NoSuchFileException => -1L }
          entries.add(f.getFileName.toString + "#" + size)
        }
        java.util.Collections.sort(entries)
        Integer.toHexString(String.join("|", entries).hashCode)
      } finally s.close()
    }

  /** One incremental refresh of matview `name`; returns the number of new
    * base-table rows processed (0 = already current, -1 = maintained by a
    * fallback full recompute or an active continuous query). */
  def refreshOnce(gs: GraftSession, name: String): Long = {
    val key = (gs.catalog.root.toString, name.toLowerCase)
    active.get(key).filter(_.isActive) match {
      case Some(q) => q.processAllAvailable(); return -1L
      case None => active.remove(key)
    }
    val v = gs.catalog.views(name.toLowerCase)
    require(v.materialized, s"$name is not materialized")
    startQuery(gs, name, None) match {
      case None => -1L // fell back to full materialize
      case Some(q) =>
        try q.processAllAvailable() finally q.stop()
        q.recentProgress.map(_.numInputRows).sum
    }
  }

  /** Continuous background maintenance — the analogue of the reference's
    * BackgroundJobScheduler + MaterializedViewRefreshJob pair, but push-
    * based: a long-running streaming query picks up every appended
    * part-file within one trigger interval and republishes the matview.
    * Caller owns the returned query's lifecycle (stop() when done). */
  def continuous(gs: GraftSession, name: String,
      triggerInterval: String = "5 seconds"): StreamingQuery = {
    val key = (gs.catalog.root.toString, name.toLowerCase)
    active.get(key).filter(_.isActive).foreach(_ =>
      throw new IllegalStateException(s"continuous maintenance already running for $name"))
    val q = startQuery(gs, name,
      Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerInterval)))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot maintain $name incrementally (view SQL is not streamable)"))
    active(key) = q
    q
  }

  /** Build and start the maintenance stream. Returns None after falling
    * back to a full recompute (un-streamable SQL / no single base). */
  private def startQuery(gs: GraftSession, name: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger]): Option[StreamingQuery] = {
    val spark = gs.spark
    val v = gs.catalog.views(name.toLowerCase)
    val baseOpt = v.sql match {
      case fromRe(t) => gs.catalog.getTable(t.replaceAll("\"", "").toLowerCase)
      case _ => None
    }
    val t = baseOpt.getOrElse { gs.materialize(v); return None }

    val ckptRoot = gs.catalog.root.resolve("_ckpt_" + v.name)
    // checkpoint validity is tied to every snapshot it may hold state from
    val marker = ckptRoot.resolve("_basever")
    val stamp = versionStamp(gs, v, Some(t.name))
    if (Files.exists(marker) && Files.readString(marker).trim != stamp)
      deleteRec(ckptRoot)
    Files.createDirectories(ckptRoot)
    Files.writeString(marker, stamp)

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
    try {
      val agg = spark.sql(PgRewrite.rewrite(v.sql))
      var writer = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", ckptRoot.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // a snapshot moved under a running maintainer → fail LOUDLY;
          // publishing from stale state would be silent corruption
          val cur = versionStamp(gs, v, Some(t.name))
          if (cur != stamp)
            throw new IllegalStateException(
              s"snapshot versions changed under matview maintenance of ${v.name} " +
                s"(was [$stamp], now [$cur]) — restart maintenance to rebuild")
          // copy-on-write publish: every batch lands in the NEXT version
          // dir and only then moves the catalog pointer, so a concurrent
          // reader that already file-listed the current dir always sees a
          // complete immutable snapshot (same discipline as table publish,
          // GraftSession.publish)
          val curView = gs.catalog.views(v.name.toLowerCase)
          val nv = curView.copy(version = curView.version + 1)
          batch.write.mode("overwrite").parquet(gs.catalog.matviewDir(nv).toString)
          gs.catalog.putView(nv)
        }
      trigger.foreach(tr => writer = writer.trigger(tr))
      Some(writer.start())
    } catch {
      case NonFatal(_) =>
        // not streamable: full recompute is always correct, and the stale
        // checkpoint must not mask the fresh state
        deleteRec(ckptRoot)
        gs.materialize(v)
        None
    } finally {
      gs.registerAll() // restore the batch temp view over the base table
    }
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
