package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

import graft.sources.Tables
import graft.streaming._

/** Structured-streaming behavior: real micro-batched execution through
  * MemoryStream, plus the batch/stream equivalence of sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts run incrementally over a real stream") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Double)]
    val events = stream.toDF()
      .select(F.col("_1").cast("timestamp").as("ts"),
        F.col("_2").as("event_type"), F.col("_3").as("value"))
    val q = Streams.windowedCounts(events, "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      stream.addData(("2024-01-01 00:10:00", "click", 1.0),
                     ("2024-01-01 00:40:00", "click", 2.0))
      q.processAllAvailable()
      stream.addData(("2024-01-01 01:05:00", "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val h0 = rows.filter(_.getAs[String]("event_type") == "click")
        .maxBy(_.getAs[Long]("n_events"))
      assert(h0.getAs[Long]("n_events") == 2)
      assert(h0.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming decontamination lands exactly the batch result across micro-batches") {
    implicit val sq = spark.sqlContext
    val evalSet = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpusRows = Seq(
      (20L, "alpha beta gamma delta words here"), // overlap: 2 grams
      (21L, "alpha beta gamma delta epsilon more"), // overlap: 3 grams
      (22L, "nothing shared at all in this one"))
    val d = Files.createTempDirectory("graft-stream-decon").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").as("text"))
    val q = Streams.decontaminateToParquet(
      docs, "text", "doc_id", evalSet, "text",
      s"$d/out", s"$d/ckpt", k = 3, minShared = 2).start()
    try {
      stream.addData(corpusRows.take(1): _*) // doc 20 alone in batch 1
      q.processAllAvailable()
      stream.addData(corpusRows.drop(1): _*) // 21 and 22 in batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$d/out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Dedup.decontaminate(
      corpusRows.toDF("doc_id", "text"), "text", "doc_id",
      evalSet, "text", k = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.contains(20L) && streamed.contains(21L) && !streamed.contains(22L))
  }

  test("streaming histogram shards merge to the exact batch quantiles") {
    implicit val sq = spark.sqlContext
    val rows = (1 to 90).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      (i * 11 % 200).toLong))
    val d = Files.createTempDirectory("graft-stream-hist").toString
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF()
      .select(F.col("_1").as("id"), F.col("_2").as("g"), F.col("_3").as("len"))
    val q = Streams.histogramSink(docs, Seq("g"), F.col("len"),
      s"$d/sk", s"$d/ckpt", width = 16).start()
    try {
      stream.addData(rows.take(30): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(30): _*)
      q.processAllAvailable()
    } finally q.stop()
    // one shard dir per batch, merged == the single-pass batch sketch
    assert(Option(new java.io.File(s"$d/sk").listFiles()).get
      .count(_.getName.startsWith("shard-")) == 2)
    val merged = graft.operators.Scale.mergedQuantiles(spark, s"$d/sk/shard-*",
        Seq("g"), probs = Seq(0.5, 0.9), width = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    graft.operators.Scale.writeHistogramSketches(
      rows.toDF("id", "g", "len"), Seq("g"), F.col("len"), s"$d/whole",
      width = 16)
    val whole = graft.operators.Scale.mergedQuantiles(spark, s"$d/whole",
        Seq("g"), probs = Seq(0.5, 0.9), width = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(merged == whole && merged.nonEmpty)
    // long-running-ingest path: compaction folds the per-batch segments
    // to one without moving a single quantile (bucket counts add)
    graft.operators.Scale.compactHistogramSketches(spark, s"$d/sk")
    assert(Option(new java.io.File(s"$d/sk").listFiles()).get
      .count(_.getName.startsWith("shard-")) == 1)
    val after = graft.operators.Scale.mergedQuantiles(spark, s"$d/sk/shard-*",
        Seq("g"), probs = Seq(0.5, 0.9), width = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(after == whole)
  }

  test("streaming CMS shards merge to the exact batch estimates and compact") {
    implicit val sq = spark.sqlContext
    val rows = (1 to 40).map(i => (i.toLong, "alpha beta")) ++
      (1 to 10).map(i => (100L + i, "alpha"))
    val d = Files.createTempDirectory("graft-stream-cms").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").as("text"))
    val q = Streams.cmsSink(docs, "text", s"$d/sk", s"$d/ckpt").start()
    try {
      stream.addData(rows.take(25): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()
    // one shard dir per batch; merged estimates = whole-corpus counts
    // (tiny vocabulary, wide sketch → exact regime)
    assert(Option(new java.io.File(s"$d/sk").listFiles()).get
      .count(_.getName.startsWith("shard-")) == 2)
    def est() = graft.operators.Scale.cmsTokenEstimates(spark,
        s"$d/sk/shard-*", Seq("alpha", "beta", "absent"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val streamed = est()
    assert(streamed("alpha") == ((50L, 90L)))
    assert(streamed("beta") == ((40L, 90L)))
    assert(streamed("absent") == ((0L, 90L)))
    // the long-running-ingest path: compaction folds the per-batch
    // segments to one without moving a single estimate
    graft.operators.Scale.compactCmsSketches(spark, s"$d/sk")
    assert(Option(new java.io.File(s"$d/sk").listFiles()).get
      .count(_.getName.startsWith("shard-")) == 1)
    assert(est() == streamed)
  }

  test("streaming fuzzy decontamination flags near-dups of the eval set across micro-batches") {
    implicit val sq = spark.sqlContext
    val evalSet = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "an entirely different benchmark question about physics"))
      .toDF("doc_id", "text")
    val corpusRows = Seq(
      (20L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
      (21L, "no overlap with anything in the suite whatsoever"),
      (22L, "the quick brown fox jumps over the lazy dog tonight")) // dup of 0
    val d = Files.createTempDirectory("graft-stream-fuzzy").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").as("text"))
    val q = Streams.fuzzyDecontaminateToParquet(
      docs, "text", "doc_id", evalSet, "text", "doc_id",
      s"$d/out", s"$d/ckpt", numBands = 4, rowsPerBand = 8,
      shingleN = 3, threshold = 0.5).start()
    try {
      stream.addData(corpusRows.take(1): _*) // doc 20 alone in batch 1
      q.processAllAvailable()
      stream.addData(corpusRows.drop(1): _*) // 21 and 22 in batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$d/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact duplicates of eval doc 0 flagged from BOTH batches; the
    // clean doc never appears
    assert(streamed == Set((20L, 0L, 1.0), (22L, 0L, 1.0)))
  }

  test("streaming near-dup candidates carry bucket state across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").as("text"))
    val out = Streams.minhashCandidatesStream(docs, "text", "doc_id",
      numBands = 8, rowsPerBand = 2, shingleN = 1, maxBucket = 1000)
    val q = out.writeStream.format("memory").queryName("nd_cands")
      .outputMode("append").start()
    try {
      stream.addData((0L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      assert(spark.table("nd_cands").count() == 0) // nothing to pair with yet
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about spark engines"))
      q.processAllAvailable()
      val streamed = spark.table("nd_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the pair emits when the LATER twin arrives — batch 2, against
      // batch 1's bucket state
      assert(streamed.contains((0L, 1L)))
      assert(!streamed.exists(p => p._1 == 2L || p._2 == 2L))

      // micro-batching must not change the emitted SET: the same
      // operator over the same rows as ONE static frame agrees exactly
      val static = Seq(
        (0L, "the quick brown fox jumps over the lazy dog"),
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about spark engines"))
        .toDF("doc_id", "text")
      val batch = Streams.minhashCandidatesStream(static, "text", "doc_id",
        numBands = 8, rowsPerBand = 2, shingleN = 1, maxBucket = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("stateful sessionization carries open sessions across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = Streams.sessionizeStream(stream.toDS(), gapUs = 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: two events 500us apart -> same open session
      stream.addData(SessionEvent(7L, 1000L, 1.0), SessionEvent(7L, 1500L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // batch 2: gap > 1000us closes session 0 (2 events, sum 3.0)
      stream.addData(SessionEvent(7L, 10000L, 5.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[UserSession].collect()
      assert(closed.length == 1)
      assert(closed.head == UserSession(7L, 0L, 2L, 3.0, 1000L, 1500L))
    } finally q.stop()
  }

  test("streaming next-fit packing continues the open bin across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[PackDoc]
    val q = Streams.nextFitPackStream(stream.toDS(), budget = 10)
      .writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    try {
      // batch 1 (one shard): 4 + 3 fill bin 0 to 7
      stream.addData(PackDoc(0, 1L, 4L), PackDoc(0, 2L, 3L))
      q.processAllAvailable()
      // batch 2: 3 STILL FITS bin 0 (state carried: 7+3=10); 5 then
      // overflows into bin 1; an oversized 25 opens bin 2 alone
      stream.addData(PackDoc(0, 3L, 3L), PackDoc(0, 4L, 5L), PackDoc(0, 5L, 25L))
      q.processAllAvailable()
      val out = spark.table("packed").as[PackedDoc].collect()
        .map(p => p.doc_id -> p.bin).toMap
      assert(out == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 2))
      // equality with the batch fold on the same (ordered) input
      val batch = graft.operators.Pack.nextFitPack(
        Seq((1L, "w " * 4), (2L, "w " * 3), (3L, "w " * 3), (4L, "w " * 5),
          (5L, "w " * 25)).toDF("doc_id", "text"),
        "doc_id", graft.operators.TextAnalysis.tokenCount(F.col("text")),
        budget = 10, numShards = 1)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(batch == out)
    } finally q.stop()
  }

  test("batch sessionization matches hand-computed sessions") {
    val events = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.0),
      (1L, 11L, "2024-01-01 00:10:00", 2.0),
      (1L, 12L, "2024-01-01 01:00:00", 4.0), // 50 min gap -> new session
      (2L, 13L, "2024-01-01 00:00:00", 8.0)
    ).toDF("user_id", "event_id", "s", "value")
      .withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    val out = Streams.sessionizeBatch(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1L, 0L)) == ((2L, 3.0)))
    assert(out((1L, 1L)) == ((1L, 4.0)))
    assert(out((2L, 0L)) == ((1L, 8.0)))
  }

  test("event-time timeout closes idle sessions when the watermark passes (EventTimeTimeout)") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[TimedEvent]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // counter mode OPT-IN (round 17 flipped the default to the bounded
    // timeIds encoding): this test pins the tombstone/0..n-id contract
    val q = Streams.sessionizeStreamEventTime(stream.toDS(), gapUs = 1000000L,
        timeIds = false)
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    try {
      // user 7's session: two events, then the user goes idle forever
      stream.addData(TimedEvent(7L, t("2024-01-01 00:00:00"), 1.0),
                     TimedEvent(7L, t("2024-01-01 00:00:00.5"), 2.0))
      q.processAllAvailable()
      assert(spark.table("et_sessions").count() == 0) // open, watermark at 0
      // another USER's events advance the watermark far past 7's gap...
      stream.addData(TimedEvent(8L, t("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      // ...and the next micro-batch fires 7's event-time timeout
      stream.addData(TimedEvent(8L, t("2024-01-01 00:10:01"), 1.0))
      q.processAllAvailable()
      val closed = spark.table("et_sessions").as[UserSession].collect()
      assert(closed.exists(s =>
        s.user_id == 7L && s.n_events == 2L && s.sum_value == 3.0))
      // the RETURNING-USER case: user 7 comes back long after the
      // timeout closed session 0. The counter tombstone must hand the
      // new session id 1 — state.remove() restarted the counter and a
      // second close re-emitted (7, session_id = 0), diverging from
      // the batch twin's 0..n numbering
      assert(closed.filter(_.user_id == 7L).map(_.session_id).toSeq
        == Seq(0L))
      stream.addData(TimedEvent(7L, t("2024-01-01 00:20:00"), 9.0))
      q.processAllAvailable()
      stream.addData(TimedEvent(8L, t("2024-01-01 00:30:00"), 1.0))
      q.processAllAvailable()
      stream.addData(TimedEvent(8L, t("2024-01-01 00:30:01"), 1.0))
      q.processAllAvailable()
      val after = spark.table("et_sessions").as[UserSession].collect()
      val u7 = after.filter(_.user_id == 7L).sortBy(_.session_id)
      assert(u7.map(_.session_id).toSeq == Seq(0L, 1L),
        s"returning user must get a FRESH session id: ${u7.toSeq}")
      assert(u7.last.sum_value == 9.0)
    } finally q.stop()
  }

  test("timeIds mode evicts closed-session state; ids stay unique and increasing across the eviction") {
    implicit val sq = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // identical input through BOTH modes: the counter mode's tombstone
    // is the state-bound baseline the timeIds mode must beat
    def run(timeIds: Boolean, name: String): (Seq[UserSession], Long) = {
      val stream = MemoryStream[TimedEvent]
      val q = Streams.sessionizeStreamEventTime(
          stream.toDS(), gapUs = 1000000L, timeIds = timeIds)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData(TimedEvent(7L, t("2024-01-01 00:00:00"), 1.0),
                       TimedEvent(7L, t("2024-01-01 00:00:00.5"), 2.0))
        q.processAllAvailable()
        // user 8 advances the watermark past 7's gap; the batch after
        // the watermark update fires 7's event-time timeout (EVICTION
        // in timeIds mode, tombstone in counter mode)
        stream.addData(TimedEvent(8L, t("2024-01-01 00:10:00"), 1.0))
        q.processAllAvailable()
        stream.addData(TimedEvent(8L, t("2024-01-01 00:10:01"), 1.0))
        q.processAllAvailable()
        // user 7 RETURNS after the eviction — the continuity moment
        stream.addData(TimedEvent(7L, t("2024-01-01 00:20:00"), 9.0))
        q.processAllAvailable()
        stream.addData(TimedEvent(8L, t("2024-01-01 00:30:00"), 1.0))
        q.processAllAvailable()
        stream.addData(TimedEvent(8L, t("2024-01-01 00:30:01"), 1.0))
        q.processAllAvailable()
        val rows = spark.table(name).as[UserSession].collect().toSeq
        val stateRows = q.recentProgress.reverse
          .flatMap(_.stateOperators.headOption)
          .headOption.map(_.numRowsTotal).getOrElse(-1L)
        (rows, stateRows)
      } finally q.stop()
    }
    val (bounded, boundedState) = run(timeIds = true, "ts_sess_bounded")
    val (counter, counterState) = run(timeIds = false, "ts_sess_counter")
    // CONTINUITY ACROSS EVICTION: user 7's sessions straddle a
    // state.remove(), yet ids are distinct and strictly increasing
    // (ids are start-time micros, admitted-event monotone)
    val u7 = bounded.filter(_.user_id == 7L).sortBy(_.start_us)
    assert(u7.length == 2 && u7.last.sum_value == 9.0, s"u7: ${u7.toSeq}")
    assert(u7.map(_.session_id).distinct.length == u7.length)
    assert(u7(0).session_id < u7(1).session_id,
      s"ids must increase across the eviction: ${u7.map(_.session_id).toSeq}")
    assert(u7.forall(s => s.session_id == s.start_us),
      "timeIds encodes the session id as the start event-time in micros")
    // aggregates are mode-invariant; only the id encoding differs
    def key(s: UserSession) =
      (s.user_id, s.start_us, s.end_us, s.n_events, s.sum_value)
    assert(bounded.map(key).toSet == counter.map(key).toSet)
    // THE STATE BOUND: counter mode ends with user 7's eternal
    // tombstone + user 8's open session; timeIds mode removed 7
    // entirely and holds only the open session
    assert(counterState == 2, s"counter-mode state rows: $counterState")
    assert(boundedState == 1, s"timeIds-mode state rows: $boundedState")
  }

  test("file-source stream through windowed agg into a parquet sink (end to end)") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-fstream").toString
    def write(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("s", "event_type", "value")
        .select(F.col("s").cast("timestamp").as("ts"),
          F.col("event_type"), F.col("value"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")

    write(Seq(("2024-01-01 00:10:00", "click", 1.0),
              ("2024-01-01 00:40:00", "click", 2.0)))
    val q = Streams.toParquetSink(
        Streams.windowedCounts(Streams.readParquetStream(spark, s"$dir/in"), "1 hour"),
        s"$dir/out", s"$dir/chk")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      q.processAllAvailable()
      // sentinel files advance the watermark (1h lag) past hour 0, and the
      // following micro-batch emits the closed window into the sink
      write(Seq(("2024-01-01 03:00:00", "view", 4.0)))
      q.processAllAvailable()
      write(Seq(("2024-01-01 04:00:00", "view", 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .filter(F.col("event_type") === "click").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_events") == 2L)
    assert(out.head.getAs[Double]("sum_value") == 3.0)
  }

  test("stream-stream interval join matches within the lookback window only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, String, Double)]
    val views = MemoryStream[(Long, String, Double)]
    def df(m: MemoryStream[(Long, String, Double)]) = m.toDF()
      .select(F.col("_1").as("user_id"),
        F.col("_2").cast("timestamp").as("ts"), F.col("_3").as("value"))
    val joined = Streams.intervalJoin(df(clicks), df(views), "user_id", "ts",
      lookback = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      views.addData((7L, "2024-01-01 00:00:00", 1.0),   // 5 min before click: match
                    (7L, "2024-01-01 00:20:00", 2.0),   // after click: no match
                    (8L, "2024-01-01 00:04:00", 3.0))   // other user: no match
      clicks.addData((7L, "2024-01-01 00:05:00", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ij").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("l_user_id") == 7L)
      assert(rows.head.getAs[Double]("r_value") == 1.0)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val events = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").cast("timestamp").as("ts"))
    val q = Streams.dedupStream(events, "ts", Seq("doc_id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:01:00"),
                     (2L, "2024-01-01 00:00:30"))
      q.processAllAvailable()
      // duplicate key arriving in a LATER micro-batch, still in horizon
      stream.addData((1L, "2024-01-01 00:02:00"), (3L, "2024-01-01 00:03:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // each key exactly once
    } finally q.stop()
  }

  test("streaming BM25 ingest: one atomic generation per micro-batch, batch-equal serving") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "spark window join spark"), (2L, "spark table scan"),
      (3L, "filter sort order"), (4L, "window spark"),
      (5L, "spark table scan"), (6L, "group agg window")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-bm25-stream").toString
    // 3 input files = 3 micro-batches under maxFilesPerTrigger=1
    corpus.repartition(3).write.parquet(s"$dir/in")
    val stream = Streams.readParquetStream(spark, s"$dir/in",
      maxFilesPerTrigger = 1)
    val q = Streams.bm25IndexSink(stream, "text", "doc_id", s"$dir/idx",
      s"$dir/ckpt", numBuckets = 4)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one committed generation per batch: 1 create + 2 appends
    val gens = new java.io.File(s"$dir/idx/manifest").list().toSeq
      .filter(_.startsWith("gen-"))
    assert(gens.size == 3, gens.toString)
    // the drained index answers exactly like the batch operator
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (query <- Seq("spark scan", "window")) {
      assert(scores(TextAnalysis.bm25TopKIndexed(spark, s"$dir/idx", query, k = 6))
        == scores(TextAnalysis.bm25TopK(corpus, "text", "doc_id", query, k = 6)),
        s"query=$query")
    }
  }

  test("CSV ingestion with declared schema (reference utils.py:179-203)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,price,created\n1,widget,9.5,2025-01-01T00:00:00\n2,gadget,3.25,2025-06-15T12:30:00\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("price", FloatType), StructField("created", TimestampType)))
    Tables.csvToParquet(spark, s"$dir/in.csv", schema, s"$dir/out.parquet")
    val back = spark.read.parquet(s"$dir/out.parquet")
    assert(back.schema == schema)
    assert(back.count() == 2)
    assert(back.filter("name = 'widget'").head().getFloat(2) == 9.5f)
  }

  test("streaming TFRecord sink lands trainer-readable shards equal to batch") {
    implicit val sq = spark.sqlContext
    val d = Files.createTempDirectory("graft-stream-tfrec").toString
    val stream = MemoryStream[(Long, String, Double)]
    val docs = stream.toDF()
      .select(F.col("_1").as("doc_id"), F.col("_2").as("text"),
        F.col("_3").as("score"))
    val q = Streams.tfRecordSink(docs, s"$d/out", s"$d/ckpt").start()
    try {
      stream.addData((1L, "alpha beta", 0.5), (2L, "gamma", 1.5))
      q.processAllAvailable()
      stream.addData((3L, "delta", 2.5))
      q.processAllAvailable()
    } finally q.stop()
    val back = graft.sources.TfRecord.read(spark, s"$d/out/*.tfrecord")
    // reassemble per record: (doc_id, text, score)
    val got = back.groupBy("tf_file", "rec_idx").agg(
        F.max(F.when(F.col("feature") === "doc_id",
          F.col("int_vals").getItem(0))).as("doc_id"),
        F.max(F.when(F.col("feature") === "text",
          F.col("text_val"))).as("text"),
        F.max(F.when(F.col("feature") === "score",
          F.col("float_vals").getItem(0))).as("score"))
      .collect().map(r => (r.getLong(2), r.getString(3), r.getFloat(4)))
      .toSet
    assert(got == Set((1L, "alpha beta", 0.5f), (2L, "gamma", 1.5f),
      (3L, "delta", 2.5f)))
    // unmappable stream schema fails at sink construction, loudly
    val badStream = MemoryStream[(Long, String)]
    val bad = badStream.toDF()
      .select(F.col("_1").as("id"),
        F.split(F.col("_2"), " ").as("words")) // array<string>
    assertThrows[IllegalArgumentException] {
      Streams.tfRecordSink(bad, s"$d/out2", s"$d/ckpt2")
    }
  }

  test("versioned streaming source: offsets are manifest versions, " +
       "checkpoint restart resumes the cursor, DML deltas stream") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream").toString
    val ds = s"$dir/ds"
    Versioned.commit((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    Versioned.commit((51L to 80L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    def drain(): Unit = {
      val q = spark.readStream
        .format(classOf[graft.streaming.VersionedStreamProvider].getName)
        .option("path", ds)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    // first drain: everything committed so far, in one cursor pass
    drain()
    val out1 = spark.read.parquet(s"$dir/out")
    assert(out1.count() == 80L)
    assert(out1.columns.toSeq == Seq("id", "v"))
    // nothing new: a re-drain emits no rows (cursor persisted)
    drain()
    assert(spark.read.parquet(s"$dir/out").count() == 80L)
    // append + a pruned DELETE: the next drain carries the appended
    // segment AND the DELETE's rewritten-survivor segment — and
    // nothing from carried segments
    Versioned.commit((81L to 90L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    Versioned.deleteWhere(spark, ds, F.col("id") === 60L)
    drain()
    val out3 = spark.read.parquet(s"$dir/out")
    // 80 (first drains) + 10 (append) + 29 (segment-2 survivors 51..80
    // minus id 60, re-emitted by the rewrite)
    assert(out3.count() == 119L, s"got ${out3.count()}")
    assert(out3.filter(F.col("id") === 60L).count() == 1L,
      "the pre-delete emission of id=60 stays in the sink's history")
    assert(out3.filter(F.col("id") > 80L).count() == 10L)
    // the head replayed from the stream's add-log: latest emission per
    // id — dedup by arrival does not apply here, but grouping suffices
    // for the survivor check
    val reEmitted = out3.filter(F.col("id") >= 51L && F.col("id") <= 80L)
    assert(reEmitted.count() == 59L) // 30 original + 29 survivors
    // starting a FRESH checkpoint from a later version skips history
    val q2 = spark.readStream
      .format("graft-versioned")
      .option("path", ds).option("startingVersion", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$dir/out2")
      .option("checkpointLocation", s"$dir/chk2")
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    // versions 3 (append) + 4 (delete rewrite): 10 + 29 rows
    assert(spark.read.parquet(s"$dir/out2").count() == 39L)
    // a startingVersion AHEAD of the current head must not regress the
    // checkpointed cursor to the head: versions committed later (but
    // still <= the requested start) stay excluded across restarts
    val ahead = spark.readStream
      .format("graft-versioned")
      .option("path", ds).option("startingVersion", "100")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$dir/outAhead")
      .option("checkpointLocation", s"$dir/chkAhead")
      .trigger(Trigger.AvailableNow()).start()
    try ahead.awaitTermination() finally ahead.stop()
    import spark.implicits._
    graft.sources.Versioned.commit(
      Seq((999L, "z")).toDF("id", "v"), ds, append = true)
    val ahead2 = spark.readStream
      .format("graft-versioned")
      .option("path", ds).option("startingVersion", "100")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$dir/outAhead")
      .option("checkpointLocation", s"$dir/chkAhead")
      .trigger(Trigger.AvailableNow()).start()
    try ahead2.awaitTermination() finally ahead2.stop()
    val aheadOut = scala.util.Try(
      spark.read.parquet(s"$dir/outAhead").count()).getOrElse(0L)
    assert(aheadOut == 0L,
      s"cursor regressed below the requested start: $aheadOut rows " +
        "streamed from versions the user excluded")
  }

  test("versioned stream source tails the row-level change feed") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-cdf").toString
    val ds = s"$dir/ds"
    Versioned.commit((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-versioned")
        .option("path", ds).option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$dir/cdc_out")
        .option("checkpointLocation", s"$dir/cdc_chk")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    drain()
    val out1 = spark.read.parquet(s"$dir/cdc_out")
    assert(out1.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version"))
    assert(out1.count() == 40L)
    assert(out1.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet == Set("insert"))
    // an UPDATE's micro-batch carries the preimage/postimage pair; a
    // vectored DELETE its retractions — with commit attribution
    val eng = Engine(spark, dir)
    eng.sql(s"UPDATE '$ds' SET v = 'X' WHERE id = 7")
    eng.sql(s"DELETE VECTORED FROM '$ds' WHERE id IN (9, 11)")
    drain()
    val out2 = spark.read.parquet(s"$dir/cdc_out")
    assert(out2.count() == 40L + 2L + 2L)
    val byType = out2.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 40L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 2L))
    assert(out2.where(F.col("_change_type") === "update_postimage")
      .select("v").collect().head.getString(0) == "X")
    assert(out2.where(F.col("_change_type") === "delete")
      .select("_commit_version").distinct().collect()
      .head.getLong(0) == 3L)
    // nothing new: a re-drain emits no rows (cursor persisted)
    drain()
    assert(spark.read.parquet(s"$dir/cdc_out").count() == 44L)
  }

  test("applyChanges prunes the match join to key-overlapping segments") {
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-applyprune").toString
    val rep = s"$dir/rep"
    // 8 segments of 100 rows each, disjoint id ranges
    (0 until 8).foreach { i =>
      Versioned.commit((i * 100L until i * 100L + 100)
        .map(id => (id, s"v$id")).toDF("id", "v"), rep)
    }
    // a delta confined to segment 1's key range
    val feed = Seq((105L, "X", "update_postimage", 9L),
        (107L, "X", "update_postimage", 9L))
      .toDF("id", "v", "_change_type", "_commit_version")
    val recs = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.add(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Streams.applyChanges(spark, rep, feed, Seq("id"))
      var last = -1L
      var spins = 0
      while (recs.sum() != last && spins < 100) {
        last = recs.sum(); Thread.sleep(30); spins += 1
      }
      // source-key bounds push into the match join's scan: only
      // segment 1 (100 rows) reads for the join and again for the
      // rewrite, plus delta-sized staging — an unpruned apply reads
      // all 800 rows for the join alone and breaks this budget
      assert(recs.sum() <= 500L,
        s"applyChanges read ${recs.sum()} records — the match join " +
          "scanned segments the delta's key bounds exclude")
    } finally spark.sparkContext.removeSparkListener(listener)
    val df = Versioned.read(spark, rep)
    assert(df.count() == 800L)
    assert(df.where(F.col("v") === "X").count() == 2L)
    // only segment 1 was rewritten
    assert(Versioned.changes(spark, rep, 8L).count() == 100L)
  }

  test("CDC replication: change-feed stream applied to a replica") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-replica").toString
    val src = s"$dir/src"
    val rep = s"$dir/rep"
    Versioned.commit((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), src)
    // seed the replica from the snapshot, then apply deltas only
    Versioned.commit(Versioned.read(spark, src), rep)
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-versioned")
        .option("path", src).option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
        .writeStream
        .option("checkpointLocation", s"$dir/chk")
        .foreachBatch(Streams.applyChangesSink(rep, Seq("id")))
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    val eng = Engine(spark, dir)
    eng.sql(s"UPDATE '$src' SET v = 'X' WHERE id = 7")
    eng.sql(s"DELETE VECTORED FROM '$src' WHERE id IN (9, 11)")
    Versioned.commit((41L to 45L).map(i => (i, s"v$i")).toDF("id", "v"),
      src)
    drain()
    def state(p: String) = Versioned.read(spark, p)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state(rep) == state(src))
    assert(state(rep).size == 43) // 40 - 2 deleted + 5 appended
    assert(state(rep).contains((7L, "X")))
    // more churn, including an update of a previously applied row —
    // the replica converges again through the same checkpoint cursor
    eng.sql(s"UPDATE '$src' SET v = 'Y' WHERE id = 41")
    eng.sql(s"DELETE FROM '$src' WHERE id = 42") // COW delete this time
    drain()
    assert(state(rep) == state(src))
    assert(state(rep).contains((41L, "Y")))
    assert(!state(rep).exists(_._1 == 42L))
  }

  test("maxVersionsPerTrigger bounds catch-up batches; the cursor " +
       "survives restarts mid-backlog") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-maxv").toString
    val ds = s"$dir/ds"
    // 6 committed versions, 10 rows each, disjoint id ranges
    (0 until 6).foreach { i =>
      Versioned.commit((i * 10L until i * 10L + 10)
        .map(id => (id, s"v$id")).toDF("id", "v"), ds)
    }
    // foreachBatch records (batchId, ids) so each micro-batch's
    // VERSION SPAN is pinned, not just the total
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    def drain(trigger: Trigger): Unit = {
      val q = spark.readStream
        .format("graft-versioned")
        .option("path", ds)
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream
        .option("checkpointLocation", s"$dir/chk")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val ids = df.select("id").collect().map(_.getLong(0)).toSet
          seen.merge(id, ids, (a: Set[Long], b: Set[Long]) => a ++ b)
          (): Unit
        }
        .trigger(trigger).start()
      try q.awaitTermination() finally q.stop()
    }
    // one AvailableNow drain: the 6-version backlog must arrive in
    // three 2-version micro-batches, each spanning exactly its
    // versions' rows — an unbounded source reads all 60 rows in one
    drain(Trigger.AvailableNow())
    val batches = seen.asScala.toSeq.sortBy(_._1)
    assert(batches.map(_._2).forall(_.size == 20),
      s"per-batch sizes ${batches.map(_._2.size)} — expected 20 each")
    assert(batches.length == 3, s"expected 3 micro-batches, got $batches")
    assert(batches(0)._2 == (0L until 20L).toSet)
    assert(batches(1)._2 == (20L until 40L).toSet)
    assert(batches(2)._2 == (40L until 60L).toSet)
    // restart mid-backlog: 4 more commits, drain with Trigger.Once =
    // ONE batch per run — each run is a cold restart whose first
    // getOffset must resume from the persisted cursor (an in-memory
    // cursor would recompute from startingVersion and stall)
    (6 until 10).foreach { i =>
      Versioned.commit((i * 10L until i * 10L + 10)
        .map(id => (id, s"v$id")).toDF("id", "v"), ds)
    }
    seen.clear()
    drain(Trigger.Once())
    drain(Trigger.Once())
    val after = seen.asScala.values.toSeq
    assert(after.map(_.size).sorted == Seq(20, 20),
      s"two Once restarts must each take a 2-version batch, got $after")
    assert(after.reduce(_ ++ _) == (60L until 100L).toSet)
  }

  test("maxBytesPerTrigger: batches sized by added-segment volume — " +
       "soft cap, composes with the version cap, restart-stable") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-maxb").toString
    val ds = s"$dir/ds"
    // 6 versions with row counts 10, 10, 10, 2000, 10, 10 — version 4
    // is the oversized backfill commit a version-count cap cannot see.
    // Rows carry a high-entropy ~110-char string so data bytes dominate
    // parquet's fixed footer overhead (at 10 near-empty rows the footer
    // IS the file and size ratios collapse).
    def wide(id: Long): String =
      java.util.UUID.nameUUIDFromBytes(id.toString.getBytes).toString * 3
    val sizesRows = Seq(10, 10, 10, 2000, 10, 10)
    var nextId = 0L
    sizesRows.foreach { n =>
      Versioned.commit((nextId until nextId + n)
        .map(id => (id, wide(id))).toDF("id", "v"), ds)
      nextId += n
    }
    // the rule's expected spans, computed against the REAL on-disk
    // sizes (parquet byte sizes are not stable constants): cap = ~2.2
    // small segments — batch 1 covers v1+v2, batch 2 covers v3 (v4
    // would blow the cap), batch 3 covers v4 ALONE (soft cap admits at
    // least one version), batch 4 covers v5+v6
    val segsInOrder = (1 to 6).map(v =>
      Versioned.headSegments(spark, ds, Some(v.toLong)).last)
    val bytes = Versioned.segmentBytes(spark, ds, segsInOrder)
    val small = bytes(segsInOrder.head)
    val cap = (small * 22) / 10
    assert(bytes(segsInOrder(3)) > cap,
      "fixture broken: the backfill segment must exceed the cap alone")
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    def drain(opts: Map[String, String]): Unit = {
      val q = opts.foldLeft(spark.readStream.format("graft-versioned")
          .option("path", ds)) { case (r, (k, v)) => r.option(k, v) }
        .load()
        .writeStream
        .option("checkpointLocation", s"$dir/chk")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val ids = df.select("id").collect().map(_.getLong(0)).toSet
          seen.merge(id, ids, (a: Set[Long], b: Set[Long]) => a ++ b)
          (): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    drain(Map("maxBytesPerTrigger" -> cap.toString))
    val batches = seen.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(batches.length == 4,
      s"expected 4 size-shaped batches, got ${batches.map(_.size)}")
    assert(batches(0) == (0L until 20L).toSet)      // v1+v2 fit the cap
    assert(batches(1) == (20L until 30L).toSet)     // v3 alone (v4 too big)
    assert(batches(2) == (30L until 2030L).toSet)   // v4: soft cap, alone
    assert(batches(3) == (2030L until 2050L).toSet) // v5+v6
    // composed with the version cap: one version per batch wins even
    // where bytes would admit two
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/chk"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => p.toFile.delete(): Unit)
    seen.clear()
    drain(Map("maxBytesPerTrigger" -> cap.toString,
      "maxVersionsPerTrigger" -> "1"))
    assert(seen.asScala.size == 6,
      s"version cap 1 must win over the bytes cap: ${seen.asScala.size}")
  }

  test("readChangeFeed + maxVersionsPerTrigger: bounded catch-up " +
       "never splits an update's pre/postimage pair across batches") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-cdfadm").toString
    val ds = s"$dir/ds"
    // a 5-version backlog with DML mixed in: appends, two UPDATEs
    // (pre/postimage pairs in the feed), a copy-on-write DELETE
    Versioned.commit((1L to 20L).map(i => (i, i * 10L)).toDF("id", "v"), ds)
    val eng = Engine(spark, dir)
    eng.sql(s"UPDATE '$ds' SET v = v + 1 WHERE id <= 3")
    Versioned.commit((21L to 30L).map(i => (i, i * 10L)).toDF("id", "v"), ds)
    eng.sql(s"UPDATE '$ds' SET v = v + 5 WHERE id = 10 OR id = 25")
    eng.sql(s"DELETE FROM '$ds' WHERE id = 7")
    // drain the whole backlog at ONE VERSION PER MICRO-BATCH — the
    // tightest admission bound, where any pair-splitting would show
    val batches = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(String, Long, Long, Long)]]()
    val q = spark.readStream
      .format("graft-versioned")
      .option("path", ds)
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/chk")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("_change_type", "_commit_version", "id", "v")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq
        batches.merge(id, rows, (a: Seq[(String, Long, Long, Long)],
          b: Seq[(String, Long, Long, Long)]) => a ++ b)
        (): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val bs = batches.asScala.toSeq.sortBy(_._1).map(_._2)
    // one micro-batch per version — admission holds in CDF mode
    assert(bs.length == 5, s"expected 5 single-version batches, got ${bs.length}")
    bs.foreach { rows =>
      assert(rows.map(_._2).distinct.length == 1,
        s"a micro-batch spans more than one _commit_version: $rows")
      // PAIR ATOMICITY: version boundaries are batch boundaries, so an
      // update's preimage and postimage (same key, same version) must
      // land together — per key, image counts match inside the batch
      val pre = rows.filter(_._1 == "update_preimage").map(_._3).sorted
      val post = rows.filter(_._1 == "update_postimage").map(_._3).sorted
      assert(pre == post,
        s"pre/postimage keys diverge within a micro-batch: $pre vs $post")
    }
    // the feed content end-to-end: 30 inserts, 5 update pairs, 1 delete
    val all = bs.flatten
    assert(all.count(_._1 == "insert") == 30)
    assert(all.count(_._1 == "update_preimage") == 5)
    assert(all.count(_._1 == "update_postimage") == 5)
    assert(all.count(_._1 == "delete") == 1)
    assert(all.filter(_._1 == "delete").map(_._3) == Seq(7L))
  }

  test("vectored deletes inside a batch window: applied to added " +
       "segments, loud retraction on carried ones") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-dv").toString
    val ds = s"$dir/ds"
    Versioned.commit((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-versioned")
        .option("path", ds).load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    drain() // v1: 30 rows, cursor at 1
    val eng = Engine(spark, dir)
    // v2 appends a segment, v3 vector-deletes INSIDE it: one batch
    // window covers both, so id 105 must never stream as a live row
    Versioned.commit((101L to 120L).map(i => (i, s"v$i")).toDF("id", "v"),
      ds)
    eng.sql(s"DELETE VECTORED FROM '$ds' WHERE id = 105")
    drain()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 30L + 19L, s"got ${out.count()}")
    assert(out.where(F.col("id") === 105L).count() == 0L,
      "a row appended and vector-deleted within one batch window " +
        "streamed as a live insert")
    // v4 vector-deletes from the CARRIED first segment — a retraction
    // an append-only stream cannot express and the removals poll
    // cannot see; it must fail LOUDLY naming the fix
    eng.sql(s"DELETE VECTORED FROM '$ds' WHERE id = 3")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("readChangeFeed")),
      s"expected the carried-segment retraction to name the fix, got $ex")
  }

  test("a restore that removes a carried segment's deletion vector " +
       "(row resurrection) fails as loudly as the retraction case") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-vstream-dvres").toString
    val ds = s"$dir/ds"
    Versioned.commit((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"), ds)
    val eng = Engine(spark, dir)
    eng.sql(s"DELETE VECTORED FROM '$ds' WHERE id = 3") // v2: dv lands
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-versioned")
        .option("path", ds).load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    drain() // (0, v2]: the segment streams WITH its vector applied
    assert(spark.read.parquet(s"$dir/out").count() == 29L)
    // v3 restores to v1: the carried segment's vector DISAPPEARS, so
    // id 3 re-enters the table with no segment change — neither this
    // stream nor the removals poll can see it; must fail loudly (the
    // symmetric twin of the vector-ADDED-on-carried case above)
    Versioned.restore(spark, ds, 1L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
        m.contains("re-seed") && m.contains("restore")),
      s"expected the resurrection to fail naming the fix, got $ex")
  }
}
