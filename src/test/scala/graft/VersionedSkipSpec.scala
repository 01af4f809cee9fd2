package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.sources.{SegmentStats, Versioned}

/** Manifest-level data skipping over Versioned datasets: sidecar
  * stats, planning-time segment pruning via the custom FileIndex, and
  * every conservative fallback that keeps skipping an optimization
  * rather than a correctness gate. */
class VersionedSkipSpec extends SparkSpec {

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-skip-$tag").toString + "/ds"

  /** Ten segments, segment i holding ids [100i, 100i+100). */
  private def rangeDs(tag: String): String = {
    import spark.implicits._
    val path = freshPath(tag)
    (0 until 10).foreach { i =>
      Versioned.commit(
        (100 * i until 100 * (i + 1)).map(id =>
          (id.toLong, s"src${i % 4}", id * 2.5)).toDF("id", "src", "score"),
        path)
    }
    path
  }

  test("range predicate reads only overlapping segments, results exact") {
    val path = rangeDs("range")
    val (df, idx) = Versioned.readWithIndex(spark, path)
    val got = df.where(F.col("id") >= 250 && F.col("id") < 450)
      .agg(F.count("*"), F.sum("id")).collect().head
    assert(got.getLong(0) == 200L)
    assert(got.getLong(1) == (250L until 450L).sum)
    assert(idx.lastSegmentsTotal == 10)
    assert(idx.lastSegmentsRead == 3) // segments 2, 3, 4
    val (total, kept) = Versioned.pruneCount(spark, path,
      F.col("id") >= 250 && F.col("id") < 450)
    assert((total, kept) == ((10, 3)))
  }

  test("equality, IN, and BETWEEN prune to the owning segments") {
    val path = rangeDs("eq")
    assert(Versioned.pruneCount(spark, path, F.col("id") === 550) == ((10, 1)))
    assert(Versioned.pruneCount(spark, path,
      F.col("id").isin(5, 505, 905)) == ((10, 3)))
    assert(Versioned.pruneCount(spark, path,
      F.col("id").between(99, 100)) == ((10, 2)))
    // predicate outside every range: zero segments planned, zero rows
    val (df, idx) = Versioned.readWithIndex(spark, path)
    assert(df.where(F.col("id") === -5).count() == 0L)
    assert(idx.lastSegmentsRead == 0)
  }

  test("stable_const bounds skip like literals — the codegen-reuse " +
    "constant sees through to segment stats, Cast coercion included") {
    val path = rangeDs("stableconst")
    def sc(v: Any) = F.call_function("stable_const", F.lit(v))
    // long const: exact type match, no coercion
    assert(Versioned.pruneCount(spark, path,
      F.col("id") >= sc(250L) && F.col("id") <= sc(449L)) == ((10, 3)))
    // int const against the long column: the analyzer wraps it in a
    // non-foldable Cast the stats evaluator must see through
    // (SegmentStats.normalize) — a regression here silently reverts
    // the CDC apply's match join to full-table scans
    assert(Versioned.pruneCount(spark, path,
      F.col("id") >= sc(250) && F.col("id") <= sc(449)) == ((10, 3)))
    // execution-time listFiles prunes identically, results exact
    val (df, idx) = Versioned.readWithIndex(spark, path)
    assert(df.where(F.col("id") >= sc(250L) && F.col("id") <= sc(449L))
      .count() == 200L)
    assert(idx.lastSegmentsRead == 3)
  }

  test("a filter Spark cannot push down still answers correctly") {
    val path = rangeDs("residual")
    val df = Versioned.read(spark, path)
    // length() is not a pushable filter shape; skipping must not engage
    assert(df.where(F.length(F.col("src")) === 4).count() == 1000L)
    // and a pushable conjunct still prunes alongside the opaque one
    val (df2, idx) = Versioned.readWithIndex(spark, path)
    assert(df2.where(F.col("id") < 100 &&
      F.length(F.col("src")) === 4).count() == 100L)
    assert(idx.lastSegmentsRead == 1)
  }

  test("string bounds: equality and prefix skipping") {
    import spark.implicits._
    val path = freshPath("str")
    Seq("alpha", "apple", "avocado").toDF("w").transform(d =>
      { Versioned.commit(d, path); d })
    Seq("melon", "mango", "nectarine").toDF("w").transform(d =>
      { Versioned.commit(d, path); d })
    Seq("zebra-fruit", "zucchini").toDF("w").transform(d =>
      { Versioned.commit(d, path); d })
    assert(Versioned.pruneCount(spark, path, F.col("w") === "mango") ==
      ((3, 1)))
    assert(Versioned.pruneCount(spark, path,
      F.col("w").startsWith("zu")) == ((3, 1)))
    assert(Versioned.pruneCount(spark, path, F.col("w") > "y") == ((3, 1)))
    val (df, idx) = Versioned.readWithIndex(spark, path)
    assert(df.where(F.col("w").startsWith("a")).count() == 3L)
    assert(idx.lastSegmentsRead == 1)
  }

  test("timestamp bounds skip when written as TIMESTAMP_MICROS") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try {
      val path = freshPath("ts")
      (0 until 4).foreach { day =>
        Versioned.commit(
          (0 until 24).map(h =>
            (day * 24 + h, f"2024-03-0${day + 1}%s $h%02d:00:00"))
            .toDF("i", "s")
            .select(F.col("i"), F.to_timestamp(F.col("s")).as("ts")),
          path)
      }
      val cut = F.to_timestamp(F.lit("2024-03-03 12:00:00"))
      assert(Versioned.pruneCount(spark, path, F.col("ts") > cut) == ((4, 2)))
      val (df, idx) = Versioned.readWithIndex(spark, path)
      assert(df.where(F.col("ts") > cut).count() == 35L)
      assert(idx.lastSegmentsRead == 2)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  test("schema evolution: absent column is a sharp all-NULL statistic") {
    import spark.implicits._
    val path = freshPath("evo")
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    Versioned.commit(
      Seq((10L, "x", 5.0), (11L, "y", 6.0)).toDF("id", "s", "extra"), path)
    // equality on the evolved column cannot match the pre-evolution seg
    assert(Versioned.pruneCount(spark, path, F.col("extra") === 5.0) ==
      ((2, 1)))
    // IS NULL keeps it (and skips the fully-populated new segment)
    assert(Versioned.pruneCount(spark, path, F.col("extra").isNull) ==
      ((2, 1)))
    val df = Versioned.read(spark, path)
    assert(df.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
    assert(df.where(F.col("extra").isNull).count() == 2L)
    assert(df.where(F.col("extra") === 5.0).count() == 1L)
    assert(rows(df.where(F.col("id") === 1L).select("extra")) ==
      Set(Seq(null)))
  }

  test("null accounting: IS NULL skips null-free segments") {
    import spark.implicits._
    val path = freshPath("nulls")
    Versioned.commit(Seq((1L, Some("a")), (2L, Some("b")))
      .toDF("id", "s"), path)
    Versioned.commit(Seq((3L, None: Option[String]), (4L, Some("d")))
      .toDF("id", "s"), path)
    assert(Versioned.pruneCount(spark, path, F.col("s").isNull) == ((2, 1)))
    assert(Versioned.pruneCount(spark, path, F.col("s").isNotNull) ==
      ((2, 2)))
    assert(Versioned.read(spark, path).where(F.col("s").isNull)
      .count() == 1L)
  }

  test("exact integral bounds: no false skip at double-precision edges") {
    import spark.implicits._
    val path = freshPath("bignum")
    val big = (1L << 60) + 1L // not representable as Double
    Versioned.commit(Seq(big - 2, big).toDF("h"), path)
    Versioned.commit(Seq(1L, 2L).toDF("h"), path)
    assert(Versioned.pruneCount(spark, path, F.col("h") === big) == ((2, 1)))
    assert(Versioned.pruneCount(spark, path, F.col("h") > big) == ((2, 0)))
    assert(Versioned.read(spark, path).where(F.col("h") === big)
      .count() == 1L)
  }

  test("sidecar-less segments always read (legacy datasets)") {
    val path = rangeDs("legacy")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats"), true)
    val (df, idx) = Versioned.readWithIndex(spark, path)
    assert(df.where(F.col("id") === 5).count() == 1L)
    assert(idx.lastSegmentsRead == 10) // no stats, no skipping
    assert(Versioned.pruneCount(spark, path, F.col("id") === 5) == ((10, 10)))
    assert(df.count() == 1000L)
  }

  test("DML stays correct over the skipping read path") {
    val path = rangeDs("dml")
    Versioned.deleteWhere(spark, path, F.col("id").between(150, 249))
    val df = Versioned.read(spark, path)
    assert(df.count() == 900L)
    assert(df.where(F.col("id").between(100, 299)).count() == 100L)
    // delete-everything leaves a readable, fully-skippable empty head
    Versioned.deleteWhere(spark, path, F.lit(true))
    val (df2, idx) = Versioned.readWithIndex(spark, path)
    assert(df2.count() == 0L)
    assert(df2.schema.fieldNames.toSeq == Seq("id", "src", "score"))
    assert(df2.where(F.col("id") === 1).count() == 0L)
    assert(idx.lastSegmentsRead == 0) // rows==0 segment skips outright
  }

  test("vacuum retires sidecars with their segments") {
    import spark.implicits._
    val path = freshPath("vac")
    Versioned.commit(Seq(1L).toDF("x"), path, append = false)
    Versioned.commit(Seq(2L).toDF("x"), path, append = false)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/stats"))
      .count(_.getPath.getName.endsWith(".txt")) == 2)
    Versioned.vacuum(spark, path, keepVersions = 1)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/stats"))
      .count(_.getPath.getName.endsWith(".txt")) == 1)
  }

  test("provenance columns ride the skipping relation") {
    val path = rangeDs("prov")
    val tagged = Versioned.readWithProvenance(spark, path)
      .where(F.col("id") === 555)
    val r = tagged.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("__seg").startsWith("seg-"))
    assert(r.head.getAs[Long]("__pos") == 55L ||
      r.head.getAs[Long]("__pos") >= 0L)
  }

  /** Total records read by Spark tasks while `f` runs — zero proves a
    * statement was served from metadata alone. */
  private def recordsReadDuring(f: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.add(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      // listener events drain asynchronously — wait for quiescence
      var last = -1L
      var spins = 0
      while (recs.sum() != last && spins < 100) {
        last = recs.sum(); Thread.sleep(30); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    recs.sum()
  }

  test("metadata-only COUNT/MIN/MAX: zero records scanned") {
    val path = rangeDs("meta")
    val eng = Engine(spark, java.nio.file.Files
      .createTempDirectory("graft-skip-base").toString)
    var out: Array[org.apache.spark.sql.Row] = Array.empty
    val read = recordsReadDuring {
      out = eng.sql(s"SELECT COUNT() AS n, MIN(id) AS mn, MAX(id) AS mx," +
        s" COUNT(src) AS n_src FROM '$path'").df.collect()
    }
    assert(out.head.toSeq == Seq(1000L, 0L, 999L, 1000L))
    assert(read == 0L, s"expected metadata-only answer, scanned $read rows")
    // a WHERE clause must fall through to the scan path — same answers
    val r2 = eng.sql(s"SELECT COUNT() AS n, MAX(id) AS mx FROM '$path' " +
      "WHERE id < 500").df.collect()
    assert(r2.head.toSeq == Seq(500L, 499L))
    // string MIN/MAX is never served from bounds (truncation-unsafe):
    // correct values via the scan
    var r3: Array[org.apache.spark.sql.Row] = Array.empty
    val read3 = recordsReadDuring {
      r3 = eng.sql(s"SELECT MIN(src) AS mn FROM '$path'").df.collect()
    }
    assert(r3.head.getString(0) == "src0")
    assert(read3 > 0L)
    // default (un-aliased) output names match the scan path exactly —
    // `WHERE 1 = 1` forces the scan plan for the comparison
    val fast = eng.sql(s"SELECT COUNT(), MIN(id), MAX(id) FROM '$path'").df
    val scan = eng.sql(s"SELECT COUNT(), MIN(id), MAX(id) FROM '$path' " +
      "WHERE 1 = 1").df
    assert(fast.columns.toSeq == scan.columns.toSeq)
    assert(fast.collect().head.toSeq == scan.collect().head.toSeq)
  }

  test("metadata aggregates: evolution, version pin, sidecar gap") {
    import spark.implicits._
    val path = freshPath("metaevo")
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    Versioned.commit(
      Seq((10L, "x", 5.0), (11L, "y", 6.0)).toDF("id", "s", "extra"), path)
    val eng = Engine(spark, java.nio.file.Files
      .createTempDirectory("graft-skip-base").toString)
    val r = recordsReadDuring {
      val out = eng.sql(s"SELECT COUNT() AS n, COUNT(extra) AS ne, " +
        s"MIN(extra) AS mn, MAX(id) AS mx FROM '$path'").df.collect()
      assert(out.head.toSeq == Seq(4L, 2L, 5.0, 11L))
    }
    assert(r == 0L)
    // pinned to the pre-evolution snapshot
    val v1 = eng.sql(s"SELECT COUNT() AS n, MAX(id) AS mx FROM '$path' " +
      "FOR VERSION AS OF 1").df.collect()
    assert(v1.head.toSeq == Seq(2L, 2L))
    // a missing sidecar makes totals unprovable: values still correct,
    // served by the scan
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seg = Versioned.headSegments(spark, path).head
    fs.delete(SegmentStats.sidecar(path, seg), false)
    var out2: Array[org.apache.spark.sql.Row] = Array.empty
    val read2 = recordsReadDuring {
      out2 = eng.sql(s"SELECT COUNT() AS n, MAX(id) AS mx FROM '$path'")
        .df.collect()
    }
    assert(out2.head.toSeq == Seq(4L, 11L))
    assert(read2 > 0L)
    // ANALYZE rebuilds the gap and the fast path re-engages
    val st = eng.sql(s"ANALYZE '$path'").df.collect().head
    assert(st.toSeq == Seq(2L, 1L))
    val read4 = recordsReadDuring {
      assert(eng.sql(s"SELECT COUNT() AS n FROM '$path'").df
        .collect().head.getLong(0) == 4L)
    }
    assert(read4 == 0L)
  }

  test("ANALYZE backfills a legacy dataset's sidecars, enabling skipping") {
    val path = rangeDs("analyze")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats"), true)
    assert(Versioned.pruneCount(spark, path, F.col("id") === 5) ==
      ((10, 10)))
    val eng = Engine(spark, java.nio.file.Files
      .createTempDirectory("graft-skip-base").toString)
    assert(eng.sql(s"ANALYZE '$path'").df.collect().head.toSeq ==
      Seq(10L, 10L))
    assert(Versioned.pruneCount(spark, path, F.col("id") === 5) ==
      ((10, 1)))
    // idempotent: nothing left to build
    assert(eng.sql(s"ANALYZE '$path'").df.collect().head.toSeq ==
      Seq(10L, 0L))
    intercept[graft.sql.SemanticError] {
      eng.sql("ANALYZE 'no-such-dataset'")
    }
  }

  test("dialect WHERE over a versioned FROM prunes segments end-to-end") {
    val path = rangeDs("sqlskip")
    val eng = Engine(spark, java.nio.file.Files
      .createTempDirectory("graft-skip-base").toString)
    val read = recordsReadDuring {
      val out = eng.sql(s"SELECT COUNT() AS n FROM '$path' " +
        "WHERE id BETWEEN 120 AND 130").df.collect()
      assert(out.head.getLong(0) == 11L)
    }
    // 10 segments x 100 rows; without manifest skipping the scan reads
    // all 1000 — with it, only the owning segment's rows
    assert(read <= 200L,
      s"SQL WHERE read $read records — manifest skipping did not engage")
  }

  test("multi-segment ZORDER OPTIMIZE: z-range segments, both dims prune") {
    import spark.implicits._
    val path = freshPath("zseg")
    // 64x64 grid committed in scrambled order: no natural clustering
    val rows = (0 until 4096).map { i =>
      val j = (i * 2654435761L % 4096).toInt
      (j % 64, j / 64, i.toLong)
    }
    Versioned.commit(rows.toDF("x", "y", "id").repartition(8), path)
    val eng = Engine(spark, java.nio.file.Files
      .createTempDirectory("graft-skip-base").toString)
    val st = eng.sql(s"OPTIMIZE '$path' ZORDER BY (x, y) SEGMENTS 8")
      .df.collect().head
    val nSegs = Versioned.segmentCount(spark, path)
    assert(nSegs >= 4 && nSegs <= 8, s"expected ~8 z-range segments, $nSegs")
    // content byte-for-byte preserved
    val df = Versioned.read(spark, path)
    assert(df.count() == 4096L)
    assert(df.agg(F.sum("id")).collect().head.getLong(0) ==
      (0 until 4096).map(_.toLong).sum)
    // BOTH clustered dimensions now prune at the manifest level
    val (t1, k1) = Versioned.pruneCount(spark, path, F.col("x") < 8)
    val (_, k2) = Versioned.pruneCount(spark, path, F.col("y") < 8)
    assert(t1 == nSegs)
    assert(k1 < nSegs, s"x-range predicate kept all $k1 segments")
    assert(k2 < nSegs, s"y-range predicate kept all $k2 segments")
    assert(df.where(F.col("x") < 8).count() == 8 * 64L)
    // segment granularity is DML granularity: a selective delete on
    // the clustered dim carries most segments by reference
    val before = Versioned.headSegments(spark, path).toSet
    Versioned.deleteWhere(spark, path, F.col("x") === 3)
    val carried =
      before.intersect(Versioned.headSegments(spark, path).toSet).size
    assert(carried > 0, "selective DELETE rewrote every z-range segment")
    assert(Versioned.read(spark, path).count() == 4096L - 64L)
    // a crashed staging dir is swept by vacuum
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/.optimize-tmp-dead"))
    Versioned.vacuum(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/.optimize-tmp-dead")))
    assert(st.getLong(1) == 1L) // segments_compacted: the 1 input seg
  }

  test("bloom sidecars: point lookups prune value-interleaved segments") {
    import spark.implicits._
    val path = freshPath("bloom")
    val opts = Versioned.bloomOptions(Map("id" -> 300L, "tag" -> 300L))
    (0 until 4).foreach { r =>
      Versioned.commit(
        (0 until 1000).filter(_ % 4 == r)
          .map(i => (i.toLong, s"tag-$i")).toDF("id", "tag"),
        path, writerOptions = opts)
    }
    // every segment's [min, max] spans nearly the whole domain: range
    // stats keep all 4; only the bloom can isolate the owner (<= 2
    // tolerates a false positive)
    val (tot, kId) = Versioned.pruneCount(spark, path, F.col("id") === 42L)
    assert(tot == 4)
    assert(kId >= 1 && kId <= 2, s"bloom kept $kId of 4")
    assert(Versioned.read(spark, path).where(F.col("id") === 42L)
      .count() == 1L)
    val (_, kStr) = Versioned.pruneCount(spark, path,
      F.col("tag") === "tag-43")
    assert(kStr >= 1 && kStr <= 2, s"string bloom kept $kStr of 4")
    assert(Versioned.read(spark, path).where(F.col("tag") === "tag-43")
      .count() == 1L)
    val (_, kIn) = Versioned.pruneCount(spark, path,
      F.col("id").isin(42L, 43L))
    assert(kIn >= 2 && kIn <= 3, s"IN bloom kept $kIn of 4")
    // a value inside the string bounds but present NOWHERE: the bloom
    // proves absence
    val (_, kMiss) = Versioned.pruneCount(spark, path,
      F.col("tag") === "tag-5000")
    assert(kMiss <= 1, s"absent value kept $kMiss segments")
    assert(Versioned.read(spark, path)
      .where(F.col("tag") === "tag-5000").count() == 0L)
    // inequality predicates never consult the bloom
    assert(Versioned.pruneCount(spark, path, F.col("id") >= 0L)._2 == 4)
    // without the writer option there is no bloom and no point pruning
    val bare = freshPath("bloomless")
    (0 until 2).foreach { r =>
      Versioned.commit((0 until 100).filter(_ % 2 == r)
        .map(_.toLong).toDF("id"), bare)
    }
    assert(Versioned.pruneCount(spark, bare, F.col("id") === 42L) ==
      ((2, 2)))
  }

  test("corrupt sidecar degrades to read-everything") {
    val path = rangeDs("corrupt")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // corrupt the LAST segment's sidecar (ids 900-999) — it must then
    // always read, alongside the true owner of id=5 (the first)
    val seg = Versioned.headSegments(spark, path).last
    val out = fs.create(SegmentStats.sidecar(path, seg), true)
    out.write("not a sidecar".getBytes("UTF-8")); out.close()
    assert(Versioned.pruneCount(spark, path, F.col("id") === 5)._2 == 2)
    assert(Versioned.read(spark, path).where(F.col("id") === 5)
      .count() == 1L)
  }
}
