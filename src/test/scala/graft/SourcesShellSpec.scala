package graft

import java.nio.file.Files

import graft.sources.Tables

/** Coverage for the IO surfaces and the shell loop that previously had no
  * gate of any kind: merge (reference io.py:297-305 merge_files), inspect
  * (reference examples/read_block_file.py:8-24), and the `;`-terminated
  * REPL (reference shell.py:73-101). */
class SourcesShellSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-sources").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/part1.parquet")
    Seq((3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/part2.parquet")
    fruits.write.mode("overwrite").parquet(s"$d/fruits.parquet")
    d
  }

  test("merge concatenates same-schema tables (reference io.py:297-305)") {
    val merged = Tables.merge(spark, Seq(s"$dir/part1.parquet", s"$dir/part2.parquet"))
    assert(merged.count() == 3)
    assert(rows(merged) == Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    // the reference's merge operates on BlockFiles — mixed inputs union
    Tables.blockFileWrite(Seq((4, "d")).toDF("id", "v"), s"$dir/part3.bin")
    val mixed = Tables.merge(spark,
      Seq(s"$dir/part1.parquet", s"$dir/part2.parquet", s"$dir/part3.bin"))
    assert(rows(mixed) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c"), Seq(4, "d")))
  }

  test("inspect returns the row count (reference read_block_file.py:8-24)") {
    assert(Tables.inspect(spark, s"$dir/part1.parquet", n = 1) == 2L)
  }

  test("JSONL and ORC ingestion round-trip losslessly with a declared schema") {
    val d = Files.createTempDirectory("graft-ingest").toString
    fruits.write.mode("overwrite").json(s"$d/fr_jsonl")
    fruits.write.mode("overwrite").orc(s"$d/fr_orc")
    val viaJsonl = Tables.readJsonl(spark, s"$d/fr_jsonl", fruits.schema)
      .select("fruit", "quantity", "color")
    val viaOrc = Tables.readOrc(spark, s"$d/fr_orc", fruits.schema)
      .select("fruit", "quantity", "color")
    assert(rows(viaJsonl) == rows(fruits))
    assert(rows(viaOrc) == rows(fruits))
    // landing conversions produce parquet twins
    Tables.orcToParquet(spark, s"$d/fr_orc", fruits.schema, s"$d/fr_pq")
    assert(rows(spark.read.parquet(s"$d/fr_pq")) == rows(fruits))
  }

  test("TFRecord: CRC-validated framing, tf.Example proto walk, salvage") {
    import graft.sources.TfRecord
    val exs = Seq(
      TfRecord.exampleBytes(Seq("text" -> "hello world"),
        Seq("ids" -> Seq(1L, 300L, -5L)), Seq("w" -> Seq(0.5f, 2.25f))),
      TfRecord.exampleBytes(Seq("text" -> ""), Seq("ids" -> Seq(Long.MaxValue))))
    val d = java.nio.file.Files.createTempDirectory("graft-tfrec").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/a.tfrecord"),
      TfRecord.tfRecordBytes(exs))
    val out = graft.sources.TfRecord.read(spark, s"$d/a.tfrecord").collect()
      .map(r => (r.getLong(1), r.getString(2)) ->
        ((Option(r.getString(3)), Option(r.getSeq[Long](4)),
          Option(r.getSeq[Float](5)))))
      .toMap
    assert(out((0L, "text")) == ((Some("hello world"), None, None)))
    assert(out((0L, "ids"))._2.get == Seq(1L, 300L, -5L))
    assert(out((0L, "w"))._3.get == Seq(0.5f, 2.25f))
    assert(out((1L, "text")) == ((Some(""), None, None)))
    assert(out((1L, "ids"))._2.get == Seq(Long.MaxValue))
    // a corrupted payload CRC ends the walk, salvaging the prefix
    val whole = TfRecord.tfRecordBytes(exs)
    val corrupt = whole.clone()
    corrupt(corrupt.length - 6) = (corrupt(corrupt.length - 6) ^ 0x7F).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/c.tfrecord"),
      corrupt)
    assert(graft.sources.TfRecord.read(spark, s"$d/c.tfrecord").collect()
      .map(_.getLong(1)).toSet == Set(0L))
    // garbage bytes -> zero rows, never a throw
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/junk.tfrecord"),
      "not a tfrecord".getBytes("UTF-8"))
    assert(graft.sources.TfRecord.read(spark, s"$d/junk.tfrecord").count() == 0)
    // a valid frame whose payload is NOT an Example is skipped, and
    // later valid records still surface
    val mixed = TfRecord.tfRecordBytes(Seq(
      Array[Byte](0x0D, 1, 2, 3, 4), // field 1, wire 5 (fixed32): no Features
      TfRecord.exampleBytes(Seq("k" -> "v"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/m.tfrecord"), mixed)
    val m = graft.sources.TfRecord.read(spark, s"$d/m.tfrecord").collect()
    assert(m.length == 1 && m.head.getLong(1) == 1L &&
      m.head.getString(3) == "v")
  }

  test("parquet footer stats equal scan aggregates without decoding pages") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val d = java.nio.file.Files.createTempDirectory("graft-footer").toString
    val df = ((1 to 100).map(i => (i.toLong, if (i % 10 == 0) None
        else Some(i * 1.5), s"s$i")))
      .toDF("k", "v", "name")
    df.repartition(3).write.parquet(s"$d/t")
    val st = graft.sources.Tables.parquetFooterStats(spark, s"$d/t")
      .groupBy("column")
      .agg(F.sum("n_values").as("n"), F.sum("n_nulls").as("nulls"),
        F.min("min_val").as("mn"), F.max("max_val").as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.get(2), r.get(3), r.get(4)))).toMap
    assert(st("k") == ((100L, 0L, 1.0, 100.0)))
    assert(st("v") == ((100L, 10L, 1.5, 148.5))) // i=100 is null; 99·1.5
    // string columns surface counts but not (lossy, truncatable) bounds
    assert(st("name")._1 == 100L && st("name")._3 == null)
    // empty dir -> empty frame, no throw
    new java.io.File(s"$d/empty").mkdirs()
    assert(graft.sources.Tables.parquetFooterStats(spark, s"$d/empty")
      .count() == 0)
    // the dialect statement serves the same numbers
    val eng = graft.Engine(spark, d)
    val viaSql = eng.sql(s"SUMMARIZE FOOTERS '$d/t'").df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql("k") == 100L && viaSql("v") == 100L)
    // Versioned datasets reject (footers cannot see manifests)
    import spark.implicits._
    graft.sources.Versioned.commit(Seq((1L, "a")).toDF("id", "x"), s"$d/vds")
    assertThrows[graft.sql.SemanticError] {
      eng.sql(s"SUMMARIZE FOOTERS '$d/vds'")
    }
  }

  test("dialect FROMs crawl/archive formats directly by extension") {
    import graft.sources.{Archives, Warc}
    val d = java.nio.file.Files.createTempDirectory("graft-from-formats").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/c.warc"),
      Warc.warcBytes(Seq(
        ("http://a/1", "2026-01-01T00:00:00Z", "alpha beta"),
        ("http://a/2", "2026-01-01T00:00:00Z", "gamma"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/t.tar"),
      Archives.tarBytes(Seq(("x.txt", "one"), ("y.txt", "two two"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/z.zip"),
      Archives.zipBytes(Seq(("a.txt", "zzz"))))
    val eng = graft.Engine(spark, d)
    // quoted paths and base-relative bare refs both resolve
    assert(eng.sql(s"SELECT COUNT() AS n FROM '$d/c.warc'").df
      .head().getLong(0) == 2L)
    assert(eng.sql("SELECT target_uri FROM 'c.warc' WHERE body = 'gamma'")
      .df.head().getString(0) == "http://a/2")
    assert(eng.sql("SELECT entry_name FROM 't.tar' ORDER BY entry_name")
      .df.collect().map(_.getString(0)).toSeq == Seq("x.txt", "y.txt"))
    assert(eng.sql("SELECT text FROM 'z.zip'").df.head().getString(0) == "zzz")
    // the whole statement surface composes: DESCRIBE + aggregation
    assert(eng.sql("DESCRIBE 'c.warc'").df.collect()
      .map(_.getString(0)).contains("target_uri"))
    assert(eng.sql(
      "SELECT SUM(n_bytes) AS b FROM 't.tar'").df.head().getLong(0) == 10L)
    // Avro and TFRecord route by extension too
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    graft.sources.Avro.writeFile(new java.io.File(s"$d/r.avro"),
      StructType(Seq(StructField("id", LongType, false),
        StructField("s", StringType, true))),
      Iterator(Row(1L, "aa"), Row(2L, "bb")), "deflate")
    assert(eng.sql("SELECT s FROM 'r.avro' WHERE id = 2").df
      .head().getString(0) == "bb")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/r.tfrecord"),
      graft.sources.TfRecord.tfRecordBytes(Seq(
        graft.sources.TfRecord.exampleBytes(
          Seq("text" -> "hello"), Seq("doc_id" -> Seq(5L)), Seq.empty))))
    assert(eng.sql(
      "SELECT COUNT() AS n FROM 'r.tfrecord'").df.head().getLong(0) == 2L)
    // headered CSV (inferred types) and JSONL route by extension too
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/r.csv"),
      "k,v\n1,aa\n2,bb\n".getBytes("UTF-8"))
    assert(eng.sql("SELECT v FROM 'r.csv' WHERE k = 2").df
      .head().getString(0) == "bb")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/r.jsonl"),
      "{\"k\": 1, \"v\": \"xx\"}\n{\"k\": 2, \"v\": \"yy\"}\n"
        .getBytes("UTF-8"))
    assert(eng.sql("SELECT v FROM 'r.jsonl' WHERE k = 1").df
      .head().getString(0) == "xx")
  }

  test("TAR/ZIP ingestion: entry walks, gz, long names, truncation") {
    import graft.sources.Archives
    val entries = Seq(
      ("a.txt", "hello"),
      ("dir/nested.txt", "multi\nline\ncontent"),
      ("empty.txt", ""))
    val d = java.nio.file.Files.createTempDirectory("graft-archives").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/p.tar"),
      Archives.tarBytes(entries))
    val gz = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(gz)
    z.write(Archives.tarBytes(entries)); z.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/g.tar.gz"),
      gz.toByteArray)
    for (f <- Seq("p.tar", "g.tar.gz")) {
      val out = Archives.readTar(spark, s"$d/$f").collect()
        .map(r => r.getString(1) -> r.getString(3)).toMap
      assert(out == entries.toMap, f)
    }
    // a GNU long-name 'L' entry names the next regular entry (header
    // checksum computed the standard way — the reader validates it)
    val longName = "x/" * 60 + "leaf.txt" // > 100 bytes
    val lData = longName.getBytes("UTF-8")
    val lHdr = new Array[Byte](512)
    System.arraycopy("././@LongLink".getBytes, 0, lHdr, 0, 13)
    System.arraycopy(f"${lData.length}%011o".getBytes, 0, lHdr, 124, 11)
    lHdr(156) = 'L'
    java.util.Arrays.fill(lHdr, 148, 156, ' '.toByte)
    val lSum = lHdr.foldLeft(0L)((a, b) => a + (b & 0xFF))
    System.arraycopy(f"$lSum%06o".getBytes, 0, lHdr, 148, 6)
    lHdr(154) = 0; lHdr(155) = ' '
    val lPad = new Array[Byte]((512 - lData.length % 512) % 512)
    val gnu = lHdr ++ lData ++ lPad ++ Archives.tarBytes(Seq(("short", "v")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/l.tar"), gnu)
    val lOut = Archives.readTar(spark, s"$d/l.tar").collect()
    assert(lOut.length == 1 && lOut.head.getString(1) == longName &&
      lOut.head.getString(3) == "v")
    // truncated tail salvages the intact prefix; garbage yields nothing
    val whole = Archives.tarBytes(entries)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/t.tar"),
      whole.take(whole.length - 1100))
    assert(Archives.readTar(spark, s"$d/t.tar").count() < 3)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/junk.tar"),
      "not a tar".getBytes("UTF-8"))
    assert(Archives.readTar(spark, s"$d/junk.tar").count() == 0)
    // zip round trip incl. directories skipped
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/p.zip"),
      Archives.zipBytes(entries))
    val zOut = Archives.readZip(spark, s"$d/p.zip").collect()
      .map(r => r.getString(1) -> r.getString(3)).toMap
    assert(zOut == entries.toMap)
  }

  test("WARC: record walk, gzip member layout, HTTP embed, salvaged tails") {
    import graft.sources.Warc
    val recs = Seq(
      ("http://a.example/1", "2026-01-01T00:00:00Z", "hello world"),
      ("http://a.example/2", "2026-01-02T00:00:00Z",
        "multi\nline body with: colons\r\nand CRLF"),
      ("http://a.example/3", "2026-01-03T00:00:00Z", ""))
    val d = java.nio.file.Files.createTempDirectory("graft-warc").toString
    // plain and member-per-record gzip layouts must read identically
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/a.warc"),
      Warc.warcBytes(recs))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/b.warc.gz"),
      Warc.warcBytes(recs, gzip = true))
    for (f <- Seq("a.warc", "b.warc.gz")) {
      val out = Warc.read(spark, s"$d/$f").collect()
        .map(r => (r.getString(2), r.getInt(4), r.getString(5), r.getString(6)))
      assert(out.length == 3, f)
      assert(out.toSet == recs.map { case (u, _, b) =>
        (u, 200, "text/plain", b) }.toSet, f)
    }
    // a glob over both = one task per file, six records
    assert(Warc.read(spark, s"$d/*").count() == 6)
    // a truncated trailing record salvages the intact prefix (a crawl
    // reader must not reject a whole file for one cut-off tail)
    val whole = Warc.warcBytes(recs)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/trunc.warc"),
      whole.take(whole.length - 20))
    assert(Warc.read(spark, s"$d/trunc.warc").count() == 2)
    // non-response records surface their raw block and status -1
    val meta = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      "Content-Length: 9\r\n\r\nrobots: x\r\n\r\n").getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/meta.warc"), meta)
    val m = Warc.read(spark, s"$d/meta.warc").collect()
    assert(m.length == 1 && m.head.getString(1) == "warcinfo" &&
      m.head.getInt(4) == -1 && m.head.getString(6) == "robots: x")
    // garbage bytes -> zero rows, never a throw
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/junk.warc"),
      "not a warc at all".getBytes("UTF-8"))
    assert(Warc.read(spark, s"$d/junk.warc").count() == 0)
  }

  test("BlockFile: multi-block round trip, per-block partitions, pruned reads, limits") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val d = Files.createTempDirectory("graft-blockfile").toString
    val src = Seq(
      (1, "alpha", 1.5f, "2024-01-02 03:04:05"),
      (2, "beta", -2.25f, "2024-06-07 08:09:10"),
      (3, "", 0.0f, "1999-12-31 23:59:59"),
      (4, "delta", 3.75f, "2024-01-01 00:00:00"),
      (5, "épsilon", 1e10f, "2024-03-04 05:06:07")
    ).toDF("i", "s", "f", "ts0")
      .select(F.col("i"), F.col("s"), F.col("f"),
        F.col("ts0").cast("timestamp").as("t"))
    Tables.blockFileWrite(src, s"$d/t.bin", rowsPerBlock = 2)
    val back = Tables.blockFileRead(spark, s"$d/t.bin")
    assert(back.schema.fieldNames.toSeq == Seq("i", "s", "f", "t"))
    assert(rows(back) == rows(src))
    // blocks are the unit of parallelism: 5 rows at 2/block = 3 blocks
    assert(back.rdd.getNumPartitions == 3)
    // column pruning through the size prefixes: a projected read agrees
    assert(back.select("s").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("", "alpha", "beta", "delta", "épsilon"))
    assert(back.count() == 5)
    // COUNT(*) pushes down to block metadata — the plan carries the
    // count scan, not the column scan, and the header-summed count
    // agrees with the row count
    val countPlan = back.groupBy().count().queryExecution.executedPlan.toString
    assert(countPlan.contains("BlockFileCountScan"), countPlan.take(1500))
    assert(back.groupBy().count().head().getLong(0) == 5L)
    // ...but anything beyond a bare ungrouped count declines the
    // pushdown and plans normally
    val grouped = back.groupBy("s").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("BlockFileCountScan"))
    assert(grouped.collect().map(_.getLong(1)).sum == 5L)
    val filtered = back.filter("i > 2")
    assert(!filtered.groupBy().count().queryExecution.executedPlan.toString
      .contains("BlockFileCountScan"))
    assert(filtered.count() == 3L)
    // format limits enforced loudly: >254-byte strings, unsupported types
    val tooLong = Seq((1, "x" * 300)).toDF("i", "s")
    assertThrows[Exception](Tables.blockFileWrite(tooLong, s"$d/bad.bin"))
    assertThrows[IllegalArgumentException](
      Tables.blockFileWrite(Seq((1L, "a")).toDF("l", "s"), s"$d/bad2.bin"))
  }

  test("BlockFile: append merges into an under-full final block (reference invariant)") {
    // mirrors tests/test_io.py:75-98 under a small block cap: single-row
    // appends fill one block to the cap, the 11th opens a second block,
    // five more merge into it, five more split a third — and unlike the
    // reference's test, VALUES are asserted after every step (its
    // full-last-block seek bug corrupts data while keeping counts right;
    // see BlockFile.append's divergence note).
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bf-append").toString
    val p = s"$d/app.bin"
    def one(s: String) = Seq(Tuple1(s)).toDF("col1")
    def blocks = graft.sources.BlockFile.blockStarts(p).length
    def readBack = Tables.blockFileRead(spark, p).collect()
      .map(_.getString(0)).toSeq
    (1 to 10).foreach { i =>
      Tables.blockFileAppend(one(s"x$i"), p, rowsPerBlock = 10)
      assert(blocks == 1)
    }
    Tables.blockFileAppend(one("x11"), p, rowsPerBlock = 10)
    assert(blocks == 2 && readBack.sorted == (1 to 11).map(i => s"x$i").sorted)
    Tables.blockFileAppend(
      (12 to 16).map(i => s"x$i").toDF("col1"), p, rowsPerBlock = 10)
    assert(blocks == 2 && readBack.sorted == (1 to 16).map(i => s"x$i").sorted)
    Tables.blockFileAppend(
      (17 to 21).map(i => s"x$i").toDF("col1"), p, rowsPerBlock = 10)
    assert(blocks == 3 && readBack.sorted == (1 to 21).map(i => s"x$i").sorted)
    // schema mismatch fails loudly, like the reference's assert
    assertThrows[IllegalArgumentException](
      Tables.blockFileAppend(Seq(Tuple1(1)).toDF("col1"), p, rowsPerBlock = 10))
    // append to a missing file degrades to write (io.py:233-234)
    Tables.blockFileAppend(one("y1"), s"$d/fresh.bin", rowsPerBlock = 10)
    assert(Tables.blockFileRead(spark, s"$d/fresh.bin").count() == 1)
    // multi-type append round-trips: int/float/timestamp alongside text
    val typed = Seq((1, 1.5f, "2024-01-02 03:04:05", "a"),
                    (2, -0.25f, "2024-06-07 08:09:10", "b"))
      .toDF("i", "f", "ts0", "s")
      .select(org.apache.spark.sql.functions.col("i"),
        org.apache.spark.sql.functions.col("f"),
        org.apache.spark.sql.functions.col("ts0").cast("timestamp").as("t"),
        org.apache.spark.sql.functions.col("s"))
    Tables.blockFileWrite(typed.limit(1), s"$d/typed.bin", rowsPerBlock = 10)
    Tables.blockFileAppend(typed.filter("i = 2"), s"$d/typed.bin",
      rowsPerBlock = 10)
    assert(rows(Tables.blockFileRead(spark, s"$d/typed.bin")) == rows(typed))
  }

  test("BlockFile: directory-of-blocks parallel write, read, append invariant") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft-bf-dir").toString
    val p = s"$d/tbl"
    // one part PER TASK: 4 input partitions must produce 4 part files —
    // the write-side parallelism the single-file format cannot have
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("i", "s").repartition(4)
    Tables.blockFileWriteDir(df, p, rowsPerBlock = 10)
    def parts = graft.sources.BlockFile.partFiles(new java.io.File(p))
    assert(parts.length == 4, s"expected 4 task-written parts, got ${parts.length}")
    def back = Tables.blockFileRead(spark, p)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
      .toSeq == (1 to 100).map(i => (i, s"v$i")))
    // scan parallelism: one read partition per block across ALL parts
    val totalBlocks = parts
      .map(f => graft.sources.BlockFile.blockStarts(f.getPath).length).sum
    assert(back.rdd.getNumPartitions == totalBlocks)
    // COUNT(*) pushdown sums block headers across the directory
    assert(back.count() == 100L)
    // column pruning still routes through the per-part size prefixes
    assert(back.select(col("s")).where(col("s") === "v7").count() == 1L)

    // append invariant AT THE DIRECTORY BOUNDARY: the last part's
    // under-full tail block absorbs appended rows (single-file
    // invariant, reference io.py:231-252); earlier parts untouched
    def lastPart = parts.last.getPath
    def lastBlocks = graft.sources.BlockFile.blockStarts(lastPart).length
    def tailRows: Int = {
      val f = new java.io.RandomAccessFile(lastPart, "r")
      try {
        f.seek(graft.sources.BlockFile.blockStarts(lastPart).last)
        val b = new Array[Byte](4); f.readFully(b)
        java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      } finally f.close()
    }
    val (blocksBefore, tailBefore) = (lastBlocks, tailRows)
    assert(tailBefore < 10) // 25-row partitions under a 10-row cap
    val room = 10 - tailBefore
    Tables.blockFileAppend(
      (101 to 100 + room).map(i => (i, s"v$i")).toDF("i", "s"), p,
      rowsPerBlock = 10)
    // the appended rows exactly fill the tail: same block count
    assert(lastBlocks == blocksBefore && tailRows == 10)
    assert(back.count() == 100L + room)
    // one more row now opens a fresh block
    Tables.blockFileAppend(Seq((999, "z")).toDF("i", "s"), p, rowsPerBlock = 10)
    assert(lastBlocks == blocksBefore + 1 && tailRows == 1)
    assert(back.count() == 101L + room)

    // empty frame still leaves a readable (zero-row) table
    Tables.blockFileWriteDir(df.filter("i < 0"), s"$d/empty", rowsPerBlock = 10)
    assert(Tables.blockFileRead(spark, s"$d/empty").count() == 0L)
    // an UNCOMMITTED directory (parts but no _SUCCESS — a writeDir job
    // that died mid-write) is refused, never served truncated...
    val uncommitted = new java.io.File(s"$d/dead"); uncommitted.mkdirs()
    Tables.blockFileWrite(Seq((1, "a")).toDF("i", "s"),
      s"$d/dead/part-00000.bin")
    assertThrows[Exception](Tables.blockFileRead(spark, s"$d/dead").collect())
    // ...and refused for APPEND too (extending a truncated failed write
    // would launder it into a "complete" table)
    assertThrows[Exception](Tables.blockFileAppend(
      Seq((2, "b")).toDF("i", "s"), s"$d/dead", rowsPerBlock = 10))
    // hand-committing per the error message makes it readable
    new java.io.File(s"$d/dead/_SUCCESS").createNewFile()
    assert(Tables.blockFileRead(spark, s"$d/dead").count() == 1L)
    // schema drift between parts fails loudly on EVERY query shape —
    // the row scan AND the block-header COUNT(*) pushdown alike
    Tables.blockFileWrite(Seq(Tuple1(1)).toDF("only"), s"$p/part-zzzzz.bin")
    assertThrows[Exception](back.collect())
    assertThrows[Exception](back.count())
  }

  test("BlockFile: our append is readable by the reference implementation") {
    import scala.sys.process._
    import spark.implicits._
    val refOk = new java.io.File("/root/reference/src/mini_spark/io.py").exists() &&
      (try { Seq("python3", "-c", "1").! == 0 } catch { case _: Exception => false })
    assume(refOk, "reference checkout / python3 not available")
    val d = Files.createTempDirectory("graft-bf-append-x").toString
    val p = s"$d/x.bin"
    Tables.blockFileWrite(
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("i", "s"), p,
      rowsPerBlock = 2) // blocks: [2, 1] — under-full tail
    Tables.blockFileAppend(Seq((4, "delta"), (5, "eps")).toDF("i", "s"), p,
      rowsPerBlock = 2) // tail merges: [2, 2, 1]
    assert(graft.sources.BlockFile.blockStarts(p).length == 3)
    val pyRead =
      s"""import sys; sys.path.insert(0, '/root/reference/src')
         |from pathlib import Path
         |from mini_spark.io import BlockFile
         |rows = list(BlockFile(Path('$p')).read_data_rows())
         |print(sorted((r['i'], r['s']) for r in rows))""".stripMargin
    val out = Seq("python3", "-c", pyRead).!!.trim
    assert(out ==
      "[(1, 'alpha'), (2, 'beta'), (3, 'gamma'), (4, 'delta'), (5, 'eps')]",
      out)
  }

  test("BlockFile: byte-level compatibility with the reference implementation") {
    // write with OUR writer, read with the REFERENCE's Python reader —
    // and the reverse — proving the files are interchangeable, not just
    // self-consistent. Skipped when the reference checkout or python
    // is unavailable (the suite must pass standalone).
    import scala.sys.process._
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val refOk = new java.io.File("/root/reference/src/mini_spark/io.py").exists() &&
      (try { Seq("python3", "-c", "1").! == 0 } catch { case _: Exception => false })
    assume(refOk, "reference checkout / python3 not available")
    val d = Files.createTempDirectory("graft-bf-compat").toString
    // ours → reference
    val src = Seq((1, "alpha", 1.5f), (2, "beta", -2.25f), (3, "gamma", 0.5f))
      .toDF("i", "s", "f")
    Tables.blockFileWrite(src, s"$d/ours.bin", rowsPerBlock = 2)
    val pyRead =
      s"""import sys; sys.path.insert(0, '/root/reference/src')
         |from pathlib import Path
         |from mini_spark.io import BlockFile
         |rows = list(BlockFile(Path('$d/ours.bin')).read_data_rows())
         |print(sorted((r['i'], r['s'], r['f']) for r in rows))""".stripMargin
    val out = Seq("python3", "-c", pyRead).!!.trim
    assert(out == "[(1, 'alpha', 1.5), (2, 'beta', -2.25), (3, 'gamma', 0.5)]", out)
    // reference → ours
    val pyWrite =
      s"""import sys; sys.path.insert(0, '/root/reference/src')
         |from pathlib import Path
         |from mini_spark.io import BlockFile
         |BlockFile(Path('$d/theirs.bin')).write_rows([
         |  {'i': 10, 's': 'ref', 'f': 0.25},
         |  {'i': 11, 's': 'file', 'f': -1.5}])""".stripMargin
    assert(Seq("python3", "-c", pyWrite).! == 0)
    val theirs = Tables.blockFileRead(spark, s"$d/theirs.bin")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getFloat(2))).toSet
    assert(theirs == Set((10, "ref", 0.25f), (11, "file", -1.5f)))
    // ...and the reference's SQL shape works VERBATIM: a quoted .bin
    // path in FROM reads through the BlockFile source
    val viaSql = Engine(spark, d).sql(
      s"SELECT s, f FROM '$d/theirs.bin' WHERE i = 10")
      .collect().map(r => (r.getString(0), r.getFloat(1))).toSeq
    assert(viaSql == Seq(("ref", 0.25f)))
  }

  test("shell repl: multiline ';'-terminated queries, errors don't kill the loop, exit stops it") {
    val engine = Engine(spark, dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = Iterator(
      "SELECT fruit, quantity FROM fruits", // multiline: no terminator yet
      "WHERE quantity > 4;",
      "SELECT nope FROM missing_table;",    // errors print, loop survives
      "exit;",
      "SELECT never_reached FROM fruits;")
    val planOut = new java.io.ByteArrayOutputStream()
    val executed = Console.withOut(new java.io.PrintStream(planOut, true, "UTF-8")) {
      Shell.repl(engine, input, out.append(_))
    }
    assert(executed == 2)
    assert(out.exists(_.startsWith("(2 rows")))    // banana 5, banana 7
    assert(out.exists(_.startsWith("error:")))
    assert(!out.exists(_.contains("never_reached")))
    // the shell prints logical AND physical plans before executing,
    // matching the reference (shell.py:61-69)
    val plans = planOut.toString("UTF-8")
    assert(plans.contains("== Parsed Logical Plan =="))
    assert(plans.contains("== Physical Plan =="))
  }

  test("shell repl with no input executes nothing and terminates") {
    val engine = Engine(spark, dir)
    assert(Shell.repl(engine, Iterator.empty, _ => ()) == 0)
  }

  test("zone maps: filtered .bin scans skip blocks; drift degrades to full scan") {
    import graft.sources.{BlockFile, ZoneMap}
    val d = Files.createTempDirectory("graft-zones").toString
    val bin = s"$d/t.bin"
    // 100 sorted rows, 10 per block → 10 blocks with disjoint id ranges
    val df = spark.range(100).selectExpr("CAST(id AS INT) AS id",
      "CAST(id AS FLOAT) AS score").coalesce(1)
    Tables.blockFileWrite(df, bin, rowsPerBlock = 10)
    val plain = BlockFile.read(spark, bin).filter($"id" >= 95)
    assert(plain.rdd.getNumPartitions == 10) // no sidecar: every block
    ZoneMap.write(bin)
    val pruned = BlockFile.read(spark, bin).filter($"id" >= 95)
    assert(pruned.rdd.getNumPartitions == 1) // only the last block read
    assert(rows(pruned.select("id")) == (95 to 99).map(Seq(_)).toSet)
    // float range + equality prune too; every filter stays residual so
    // partially-covered blocks return exact rows
    val f2 = BlockFile.read(spark, bin)
      .filter($"score" < 13.0f && $"id" =!= 3)
    assert(f2.rdd.getNumPartitions == 2)
    assert(rows(f2.select("id")) ==
      ((0 to 12).toSet - 3).map(Seq(_)))
    // append rewrites the tail in place and deletes the sidecar — the
    // next scan is full (correct) until the sidecar is rebuilt
    BlockFile.append(Seq((100, 100.0f)).toDF("id", "score"), bin,
      rowsPerBlock = 10)
    assert(!new java.io.File(s"$bin.zones").exists())
    val after = BlockFile.read(spark, bin).filter($"id" >= 95)
    assert(after.rdd.getNumPartitions == 11)
    assert(rows(after.select("id")) == (95 to 100).map(Seq(_)).toSet)
    // a STALE sidecar (length drift) is ignored, never trusted
    ZoneMap.write(bin)
    BlockFile.append(Seq((101, 101.0f)).toDF("id", "score"), bin,
      rowsPerBlock = 10)
    Files.writeString(java.nio.file.Paths.get(s"$bin.zones"), "garbage")
    val stale = BlockFile.read(spark, bin).filter($"id" >= 95)
    assert(stale.rdd.getNumPartitions == 11)
    assert(rows(stale.select("id")) == (95 to 101).map(Seq(_)).toSet)
    // directory form: one sidecar per part, built IN TASKS (the
    // distributed overload — no driver byte path), same pruning
    val dir = s"$d/parts"
    BlockFile.writeDir(spark.range(40).selectExpr("CAST(id AS INT) AS id")
      .repartitionByRange(4, $"id"), dir, rowsPerBlock = 5)
    ZoneMap.write(spark, dir)
    val dp = BlockFile.read(spark, dir).filter($"id" === 17)
    assert(dp.rdd.getNumPartitions == 1)
    assert(rows(dp) == Set(Seq(17)))
  }

  test("versioned dataset: commit/append/time-travel, schema guard, isolation") {
    import graft.sources.Versioned
    val path = Files.createTempDirectory("graft-versioned").toString + "/ds"
    val v1 = Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    assert(v1 == 1L)
    val v2 = Versioned.commit(Seq((3, "c")).toDF("id", "v"), path)
    assert(v2 == 2L)
    assert(Versioned.versions(spark, path) == Seq(1L, 2L))
    // append is cumulative; v1 stays exactly the first commit (time travel)
    assert(rows(Versioned.read(spark, path)) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    assert(rows(Versioned.read(spark, path, Some(1L))) ==
      Set(Seq(1, "a"), Seq(2, "b")))
    // schema drift on append fails loudly
    val drifted = Seq((4, 9L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(drifted, path)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // a stray segment without a manifest commit is INVISIBLE to readers
    Seq((99, "zz")).toDF("id", "v").write.parquet(s"$path/data/seg-stray")
    assert(Versioned.read(spark, path).count() == 3)
    // overwrite (append = false) republishes from only the new segment;
    // prior versions remain readable
    val v3 = Versioned.commit(Seq((7, "g")).toDF("id", "v"), path,
      append = false)
    assert(v3 == 3L)
    assert(rows(Versioned.read(spark, path)) == Set(Seq(7, "g")))
    assert(rows(Versioned.read(spark, path, Some(2L))) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    // default vacuum keeps every version but sweeps the stray segment
    Versioned.vacuum(spark, path)
    assert(Versioned.versions(spark, path) == Seq(1L, 2L, 3L))
    assert(rows(Versioned.read(spark, path, Some(2L))) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    assert(!new java.io.File(s"$path/data/seg-stray").exists())
    // keepVersions=1 drops history: only the head survives, its data
    // intact, and exactly one segment directory remains on disk
    Versioned.vacuum(spark, path, keepVersions = 1)
    assert(Versioned.versions(spark, path) == Seq(3L))
    assert(rows(Versioned.read(spark, path)) == Set(Seq(7, "g")))
    assert(new java.io.File(s"$path/data").listFiles()
      .count(_.getName.startsWith("seg-")) == 1)
  }

  test("versioned changes(): segment-level delta, empty range, republish") {
    import graft.sources.Versioned
    val path = Files.createTempDirectory("graft-changes").toString + "/ds"
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), path)
    Versioned.commit(Seq((2, "b"), (3, "c")).toDF("id", "v"), path)
    // delta (1, head] = exactly version 2's segment
    assert(rows(Versioned.changes(spark, path, 1)) ==
      Set(Seq(2, "b"), Seq(3, "c")))
    // from 0 = everything; bounded to = prefix
    assert(Versioned.changes(spark, path, 0).count() == 3)
    assert(rows(Versioned.changes(spark, path, 0, Some(1L))) ==
      Set(Seq(1, "a")))
    // empty range: zero rows, head schema intact
    val empty = Versioned.changes(spark, path, 2)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "v"))
    // a republish (copy-on-write rewrite) starts a fresh segment list,
    // so its WHOLE snapshot is the delta — consumers reprocess
    Versioned.commit(Seq((9, "z")).toDF("id", "v"), path, append = false)
    assert(rows(Versioned.changes(spark, path, 2)) == Set(Seq(9, "z")))
    // bad cursors reject loudly
    assertThrows[IllegalArgumentException] {
      Versioned.changes(spark, path, 7)
    }
    assertThrows[IllegalArgumentException] {
      Versioned.changes(spark, path, 2, Some(1L))
    }
  }

  test("versioned schema evolution: widening append, old segments read NULL") {
    import graft.sources.Versioned
    val path = Files.createTempDirectory("graft-evolved").toString + "/ds"
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    // widening append: a new trailing column arrives mid-life — no
    // rewrite of the existing segment
    Versioned.commit(Seq((3L, "c", 0.5)).toDF("id", "v", "score"), path)
    val head = Versioned.read(spark, path)
    assert(head.columns.toSeq == Seq("id", "v", "score"))
    assert(rows(head) == Set(
      Seq(1L, "a", null), Seq(2L, "b", null), Seq(3L, "c", 0.5)))
    // a version pinned BEFORE the widening keeps its own narrow schema
    assert(Versioned.read(spark, path, Some(1L)).columns.toSeq ==
      Seq("id", "v"))
    // the NEWEST segment is the compatibility baseline: an append that
    // drops back to the narrow shape rejects (silent re-narrowing)
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((4L, "d")).toDF("id", "v"), path)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // renames/retypes still reject — evolution is trailing-add only
    assertThrows[IllegalArgumentException] {
      Versioned.commit(
        Seq((4L, "d", 1.0)).toDF("id", "renamed", "score"), path)
    }
    // the widened shape keeps appending fine
    Versioned.commit(Seq((5L, "e", 0.9)).toDF("id", "v", "score"), path)
    assert(Versioned.read(spark, path).count() == 4)
  }

  test("Avro OCF: full-type round trip, nullables, codecs, " +
       "schema drift and nested schemas reject loudly") {
    import org.apache.spark.sql.{functions => F, Row}
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toFile
    try {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("flag", BooleanType, nullable = false),
        StructField("n", IntegerType, nullable = true),
        StructField("f", FloatType, nullable = false),
        StructField("d", DoubleType, nullable = true),
        StructField("s", StringType, nullable = true),
        StructField("raw", BinaryType, nullable = true),
        StructField("vec", ArrayType(FloatType, containsNull = false),
          nullable = true)))
      val rows = Seq(
        Row(1L, true, 7, 1.5f, 2.25, "héllo\nworld", Array[Byte](0, 1, -2),
          Seq(0.5f, -1.0f)),
        Row(2L, false, null, -0.0f, null, null, null, null),
        Row(3L, true, -1, Float.MinPositiveValue, 1e300, "", Array[Byte](),
          Seq.empty[Float]))
      // one shard per codec
      graft.sources.Avro.writeFile(new java.io.File(dir, "a.avro"), schema,
        rows.take(2).iterator, "deflate")
      graft.sources.Avro.writeFile(new java.io.File(dir, "b.avro"), schema,
        rows.drop(2).iterator, "null")
      val back = graft.sources.Avro.read(spark, s"$dir/*.avro")
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        schema.map(f => (f.name, f.dataType)))
      val got = back.collect().sortBy(_.getLong(0))
      assert(got.length == 3)
      val r1 = got(0)
      assert(r1.getBoolean(1) && r1.getInt(2) == 7 && r1.getFloat(3) == 1.5f)
      assert(r1.getString(5) == "héllo\nworld")
      assert(r1.getAs[Array[Byte]](6).toSeq == Seq[Byte](0, 1, -2))
      assert(r1.getSeq[Float](7) == Seq(0.5f, -1.0f))
      val r2 = got(1)
      assert(r2.isNullAt(2) && r2.isNullAt(4) && r2.isNullAt(5) &&
        r2.isNullAt(6) && r2.isNullAt(7))
      assert(got(2).getAs[Array[Byte]](6).isEmpty &&
        got(2).getSeq[Float](7).isEmpty)

      // an EMPTY shard (schema-only container) contributes zero rows
      graft.sources.Avro.writeFile(new java.io.File(dir, "c.avro"), schema,
        Iterator.empty, "deflate")
      assert(graft.sources.Avro.read(spark, s"$dir/*.avro").count() == 3)

      // schema DRIFT across files fails the read loudly
      val drifted = StructType(Seq(StructField("id", LongType, false),
        StructField("other", StringType, true)))
      graft.sources.Avro.writeFile(new java.io.File(dir, "d.avro"), drifted,
        Iterator(Row(9L, "x")), "null")
      val ex = intercept[org.apache.spark.SparkException] {
        graft.sources.Avro.read(spark, s"$dir/*.avro").count()
      }
      assert(ex.getMessage.contains("drift") ||
        Option(ex.getCause).exists(_.getMessage.contains("drift")))
      new java.io.File(dir, "d.avro").delete()

      // nested/struct types reject at schema mapping, not silently
      assertThrows[IllegalArgumentException] {
        graft.sources.Avro.avroSchemaFor(StructType(Seq(
          StructField("nested", StructType(Seq(
            StructField("x", LongType, false))), false))))
      }
      assertThrows[IllegalArgumentException] {
        graft.sources.Avro.writeFile(new java.io.File(dir, "x.avro"),
          drifted, Iterator.empty, "zstd-nope")
      }
      // no files matching
      assertThrows[IllegalArgumentException] {
        graft.sources.Avro.read(spark, s"$dir/nothing-*.avro")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("Avro sync-marker splits: every block owned by exactly one " +
       "range, no row lost or duplicated, small files stay whole") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-split").toFile
    try {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", StringType, nullable = false)))
      // ~100-byte rows, null codec -> a multi-MB file with many 64 KB
      // sync blocks for the ranges to land inside
      val n = 50000
      graft.sources.Avro.writeFile(new java.io.File(dir, "big.avro"), schema,
        (0 until n).iterator.map(i => Row(i.toLong, "x" * 100)), "null")
      val fileLen = new java.io.File(dir, "big.avro").length()
      assert(fileLen > 4L * 1024 * 1024)
      // split aggressively: ~256 KB ranges -> dozens of tasks over one file
      val splits = graft.sources.Avro.planSplits(
        spark, s"$dir/big.avro", 256L * 1024)
      assert(splits.length > 10, s"expected many splits, got ${splits.length}")
      assert(splits.map { case (_, s, e) => e - s }.sum == fileLen,
        "ranges partition the byte length exactly")
      val back = graft.sources.Avro.read(spark, s"$dir/big.avro",
        maxSplitBytes = 256L * 1024)
      assert(back.rdd.getNumPartitions == splits.length)
      import org.apache.spark.sql.{functions => F}
      val agg = back.agg(
        F.count(F.lit(1)), F.countDistinct("id"), F.sum("id")).head()
      assert(agg.getLong(0) == n.toLong, "row count")
      assert(agg.getLong(1) == n.toLong, "no duplicated ids across ranges")
      assert(agg.getLong(2) == n.toLong * (n - 1) / 2, "id sum exact")
      // a small file beside it stays one range; glob reads both
      graft.sources.Avro.writeFile(new java.io.File(dir, "small.avro"),
        schema, Iterator(Row(1000000L, "tail")), "deflate")
      assert(graft.sources.Avro.read(spark, s"$dir/*.avro").count() ==
        n.toLong + 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("Avro timestamps: micros round trip (TZ + NTZ, pre-1970), " +
       "millis logical types widen losslessly on read") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-ts").toFile
    try {
      // instant (TZ) and wall-clock (NTZ) columns, odd micros + a
      // pre-1970 instant (the floorDiv/floorMod edge)
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("at", TimestampType, nullable = true),
        StructField("wall", TimestampNTZType, nullable = true)))
      def ts(micros: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp(
          Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      }
      def ldt(micros: Long): java.time.LocalDateTime =
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      val micros = Seq(1234567890123456L, -1234567L, 0L)
      val rows = micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, ts(us), ldt(us)) } :+ Row(99L, null, null)
      graft.sources.Avro.writeFile(new java.io.File(dir, "t.avro"), schema,
        rows.iterator, "deflate")
      // writer schema carries the standard logical types
      val w = graft.sources.Avro.writerSchema(spark, s"$dir/t.avro")
      def logical(n: String) = {
        import scala.jdk.CollectionConverters._
        w.getField(n).schema().getTypes.asScala
          .find(_.getType != org.apache.avro.Schema.Type.NULL)
          .flatMap(s => Option(s.getLogicalType)).map(_.getName)
      }
      assert(logical("at").contains("timestamp-micros"))
      assert(logical("wall").contains("local-timestamp-micros"))
      val back = graft.sources.Avro.read(spark, s"$dir/t.avro")
      assert(back.schema("at").dataType == TimestampType)
      assert(back.schema("wall").dataType == TimestampNTZType)
      val got = back.collect().sortBy(_.getLong(0))
      micros.zipWithIndex.foreach { case (us, i) =>
        assert(got(i).getTimestamp(1) == ts(us), s"at row $i")
        assert(got(i).getAs[java.time.LocalDateTime](2) == ldt(us),
          s"wall row $i")
      }
      assert(got(3).isNullAt(1) && got(3).isNullAt(2))

      // a millis-precision file (hand-built writer schema — the Kafka
      // Connect shape) reads back widened to exact micros
      val millisSchema = {
        import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
        val f = SchemaBuilder.record("r").fields()
        f.name("id").`type`(Schema.create(Schema.Type.LONG)).noDefault()
        f.name("at").`type`(LogicalTypes.timestampMillis()
          .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
        f.endRecord()
      }
      val w2 = new org.apache.avro.file.DataFileWriter[
          org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](millisSchema))
      val d2 = new java.io.File(dir, "ms")
      d2.mkdirs()
      w2.create(millisSchema, new java.io.File(d2, "m.avro"))
      val rec = new org.apache.avro.generic.GenericData.Record(millisSchema)
      rec.put(0, 1L); rec.put(1, 1234567890123L) // epoch millis
      w2.append(rec); w2.close()
      val backMs = graft.sources.Avro.read(spark, s"$d2/m.avro")
      assert(backMs.schema("at").dataType == TimestampType)
      assert(backMs.collect().head.getTimestamp(1) == ts(1234567890123000L))

      // a MIXED glob (micros shard + millis shard — a Spark archive
      // beside a Kafka-Connect one) decodes each file by ITS OWN
      // writer schema's unit: both logical types surface as
      // TimestampType, so the Spark-level drift check cannot tell
      // them apart — deriving units from the FIRST file would decode
      // the millis shard 1000x off
      val mixDir = new java.io.File(dir, "mix"); mixDir.mkdirs()
      val microsSchema = {
        import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
        val f = SchemaBuilder.record("r").fields()
        f.name("id").`type`(Schema.create(Schema.Type.LONG)).noDefault()
        f.name("at").`type`(LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
        f.endRecord()
      }
      def writeOcf(file: java.io.File, sch: org.apache.avro.Schema,
                   id: Long, v: Long): Unit = {
        val w = new org.apache.avro.file.DataFileWriter[
            org.apache.avro.generic.GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.create(sch, file)
        val r = new org.apache.avro.generic.GenericData.Record(sch)
        r.put(0, id); r.put(1, v)
        w.append(r); w.close()
      }
      // names sort micros-first: the resolved (first-file) schema is
      // micros, so the millis shard is the one that would corrupt
      writeOcf(new java.io.File(mixDir, "a_micros.avro"), microsSchema,
        1L, 1234567890123456L)               // epoch micros
      writeOcf(new java.io.File(mixDir, "z_millis.avro"), millisSchema,
        2L, 1234567890123L)                  // epoch millis, same instant-ish
      val mixed = graft.sources.Avro.read(spark, s"$mixDir/*.avro")
        .collect().sortBy(_.getLong(0))
      assert(mixed(0).getTimestamp(1) == ts(1234567890123456L))
      assert(mixed(1).getTimestamp(1) == ts(1234567890123000L),
        s"millis shard decoded as ${mixed(1).getTimestamp(1)} — " +
          "per-file timestamp units were not honored")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
