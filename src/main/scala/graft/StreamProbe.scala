package graft

import org.apache.spark.sql.functions._

/** Streaming throughput probe (dev tooling, like ScaleProbe): StreamingSpec
  * proves the streaming operators' SEMANTICS; nothing measured sustained
  * throughput or state growth. This main drives the near-dup detector
  * ([[graft.streaming.StreamingDedup]]) with a rate source whose rows map
  * onto REAL corpus documents (cycled from the fixture, so shingle/
  * signature distributions match the batch operator, and every n-th
  * arrival is a true duplicate that must flow through the stateful pair
  * emit), runs for a fixed wall-clock window, and prints one JSON line
  * per micro-batch — input vs processed rows/sec, trigger duration, state
  * rows and bytes — plus a summary row with sustained throughput, peak
  * state, and a first-half vs second-half batch-duration comparison (an
  * UNBOUNDED state or super-linear resident-list cost shows up as the
  * second half running measurably slower; bounded state does not).
  *
  *   sbt "runMain graft.StreamProbe /root/testdata/sf0.1 20000 60"
  *     (fixture dir, rows/sec, seconds; optional 4th arg "dedup" |
  *     "decontam" — decontam drives the STATELESS StreamingDecontam
  *     match pipeline, whose summary must show zero state rows)
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rate = args.lift(1).map(_.toInt).getOrElse(20000)
    val seconds = args.lift(2).map(_.toInt).getOrElse(60)
    val spark = Engine.session("graft-streamprobe")
    // the summary is computed from recentProgress, which by default
    // retains only the last 100 updates — a low-rate run with fast
    // triggers exceeds that in seconds and would silently undercount
    // totalRows / misplace the half-split. Retain far more than any
    // probe window can produce.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    import spark.implicits._

    // real corpus texts, cycled: the rate source provides arrival ids,
    // the fixture provides realistic content (and exact dups every n
    // arrivals — the detector has real work, not hash-unique noise)
    val texts = Tables.load(spark, base, "documents")
      .select(col("text")).as[String].collect()
    val n = texts.length
    val bc = spark.sparkContext.broadcast(texts)

    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8)
      .load()
      .select(col("value"))
      .as[Long]
      .map(v => (v, bc.value((v % n).toInt)))
      .toDF("doc_id", "text")

    val op = args.lift(3).getOrElse("dedup")
    val cands = op match {
      case "decontam" =>
        // static eval side frozen once (bloom bitset + PERSISTED exact
        // shingles — the stream-static join re-reads its static side
        // every trigger), then the stream runs fully stateless
        val (bits, evalSh) = graft.streaming.StreamingDecontam
          .evalBloomFromCorpus(Tables.load(spark, base, "documents"))
        graft.streaming.StreamingDecontam.matches(docs, bits, evalSh)
      case "dedup" => graft.streaming.StreamingDedup.nearDupStream(docs)
      case other =>
        // fail LOUDLY: a typo silently falling back to dedup would
        // record a stateful measurement under a decontam-looking label
        sys.error(s"unknown op '$other': expected dedup | decontam")
    }

    val q = cands.writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamprobe_ckpt").toString)
      .start()

    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < seconds && q.isActive)
      Thread.sleep(1000)
    q.stop()
    q.awaitTermination(30000)

    val progs = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    var totalRows = 0L
    val rowsJson = progs.map { p =>
      val so = p.stateOperators.headOption
      totalRows += p.numInputRows
      f"""{"batch":${p.batchId},"inputRows":${p.numInputRows},""" +
        f""""inRps":${p.inputRowsPerSecond}%.0f,"procRps":${p.processedRowsPerSecond}%.0f,""" +
        f""""triggerMs":${p.durationMs.getOrDefault("triggerExecution", 0L)},""" +
        f""""stateRows":${so.map(_.numRowsTotal).getOrElse(0L)},""" +
        f""""stateBytes":${so.map(_.memoryUsedBytes).getOrElse(0L)}}"""
    }
    rowsJson.foreach(println)
    if (progs.nonEmpty) {
      val durs = progs.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
      val half = durs.size / 2
      val firstHalf = if (half > 0) durs.take(half).sum.toDouble / half else 0.0
      val secondHalf =
        if (durs.size - half > 0) durs.drop(half).sum.toDouble / (durs.size - half) else 0.0
      val states = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      val peakState = if (states.nonEmpty) states.max else 0L
      val peakRows = if (stateRows.nonEmpty) stateRows.max else 0L
      val elapsed = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"streaming_$op","rate":$rate,"seconds":$seconds,""" +
        f""""totalRows":$totalRows,"sustainedRps":${totalRows / elapsed}%.0f,""" +
        f""""peakStateRows":$peakRows,"peakStateBytes":$peakState,""" +
        f""""avgTriggerMsFirstHalf":$firstHalf%.0f,"avgTriggerMsSecondHalf":$secondHalf%.0f}""")
    } else println(s"""{"probe":"streaming_$op","error":"no progress recorded"}""")
    spark.stop()
  }
}
