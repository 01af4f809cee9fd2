package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's native columnar "BlockFile" format, read and written
  * from Spark — so a minispark user's existing `.bin` tables load
  * directly (reference: src/mini_spark/io.py:47-171; byte-for-byte
  * layout):
  *
  *  - header: `u8` column count; per column `u8` type ordinal
  *    (INTEGER=0 STRING=1 FLOAT=2 TIMESTAMP=3, constants.py:18-23),
  *    `u8` name length, UTF-8 name (io.py:47-61);
  *  - blocks: `u32 LE` row count, then per column `u64 LE` byte size +
  *    contiguous values — i32/f32/i64-micros LE; strings as one length
  *    byte per row then concatenated UTF-8 (io.py:74-109);
  *  - footer: `u64 LE` block-start offsets then `u32 LE` block count
  *    (io.py:166-170).
  *
  * The DSv2 reader plans ONE PARTITION PER BLOCK — blocks are the
  * reference's own unit of parallelism (plan.py:90-93) — and implements
  * COLUMN PRUNING through the per-column size prefixes (io.py:112-124
  * documents the capability; the reference engine never exploits it).
  * A pruned scan seeks past unwanted columns without reading them.
  *
  * [[BlockFile.write]] streams the frame through the driver: the format
  * is a SINGLE FILE with a global footer (like the reference writes) —
  * an interchange/compat utility, not a distributed sink.
  * [[BlockFile.writeDir]] is the PARALLEL form: one part file per task
  * into a directory the reader treats as one table — no driver byte
  * path. Parquet remains the scale-path storage. */
object BlockFile {

  val MaxStrLength = 0xFF // one length byte per string (io.py:18,43-44)

  private[sources] def ordinalOf(dt: DataType): Int = dt match {
    case IntegerType   => 0
    case StringType    => 1
    case FloatType     => 2
    // NTZ included: the reference's timestamps are naive datetimes
    // (io.py:34-39) — micros of the wall-clock value either way
    case TimestampType | TimestampNTZType => 3
    case other => throw new IllegalArgumentException(
      s"BlockFile supports int/string/float/timestamp columns, got $other " +
      "(cast first — the reference's type system is exactly these four, " +
      "SURVEY §1.3)")
  }

  private[sources] def typeOf(ordinal: Int): DataType = ordinal match {
    case 0 => IntegerType
    case 1 => StringType
    case 2 => FloatType
    case 3 => TimestampType
    case other => throw new IllegalArgumentException(
      s"Unknown BlockFile type ordinal $other")
  }

  /** Part files of a DIRECTORY-form BlockFile table, in name order —
    * each a complete single-file BlockFile (see [[writeDir]]). */
  private[graft] def partFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".bin"))
      .sortBy(_.getName).toSeq

  /** [[partFiles]] gated on the [[writeDir]] job-commit marker: a
    * directory with parts but no marker is a failed/in-flight write and
    * reading it would serve a silently truncated table. */
  private[graft] def committedParts(dir: java.io.File): Seq[java.io.File] = {
    require(new java.io.File(dir, SuccessMarker).exists(),
      s"BlockFile directory $dir is not committed (no $SuccessMarker " +
      "marker — a writeDir job may have failed mid-write); refusing a " +
      "possibly truncated table. If this directory was assembled by hand " +
      s"from complete part files, create an empty $SuccessMarker file in " +
      "it to commit it")
    val parts = partFiles(dir)
    require(parts.nonEmpty,
      s"BlockFile directory $dir contains no part-*.bin files")
    parts
  }

  /** The file list a scan of `path` reads: the single file, or the
    * committed parts of a directory with every part's header schema
    * checked against the table schema (a foreign `.bin` dropped into
    * the directory must refuse loudly, not mis-decode — ALL query
    * shapes, row scans and COUNT(*) alike, route through this).
    * Cost: one header read per part per planning — O(parts) driver
    * I/O, the price of re-validating a directory that [[append]] may
    * have changed since the last plan. */
  private[sources] def validatedScanFiles(path: String,
                                          full: StructType): Seq[String] = {
    def check(p: String, name: String): Unit = {
      val s = readSchema(p)
      require(s == full,
        s"BlockFile $name schema ${s.simpleString} does not match the " +
        s"table schema ${full.simpleString} (file changed since the " +
        "DataFrame was created?)")
    }
    val f0 = new java.io.File(path)
    // single-file tables get the same header re-check: a .bin
    // overwritten with a different schema after `read` must refuse, not
    // decode the new bytes against the stale schema into garbage rows
    if (!f0.isDirectory) { check(path, f0.getName); return Seq(path) }
    val parts = committedParts(f0)
    parts.foreach(p => check(p.getPath, s"part ${p.getName}"))
    parts.map(_.getPath)
  }

  /** Read just the header schema (driver-side, a few hundred bytes).
    * A directory reads as its first committed part ([[writeDir]]). */
  def readSchema(path: String): StructType = {
    val f0 = new java.io.File(path)
    if (f0.isDirectory)
      return readSchema(committedParts(f0).head.getPath)
    val f = new RandomAccessFile(path, "r")
    try {
      val n = f.readUnsignedByte()
      StructType((0 until n).map { _ =>
        val ord = f.readUnsignedByte()
        val nameLen = f.readUnsignedByte()
        val nameBytes = new Array[Byte](nameLen)
        f.readFully(nameBytes)
        StructField(new String(nameBytes, "UTF-8"), typeOf(ord),
          nullable = false)
      })
    } finally f.close()
  }

  /** Block start offsets from the footer (driver-side). */
  def blockStarts(path: String): Seq[Long] = {
    val f = new RandomAccessFile(path, "r")
    try {
      f.seek(f.length() - 4)
      val count = readU32(f)
      f.seek(f.length() - 4 - 8L * count)
      (0 until count).map(_ => readU64(f))
    } finally f.close()
  }

  private def readU32(f: RandomAccessFile): Int = {
    val b = new Array[Byte](4); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }
  private def readU64(f: RandomAccessFile): Long = {
    val b = new Array[Byte](8); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Write `df` as ONE BlockFile. Schema must already be the reference's
    * four types (cast beforehand); strings must encode under 255 UTF-8
    * bytes (the format's one-byte length, io.py:43-44) — violations
    * throw rather than truncate.
    *
    * String length-byte semantics: this writer (and this reader) use the
    * UTF-8 BYTE length. The reference writer emits the CHARACTER count
    * while writing UTF-8 bytes (io.py `len(str(val)) & 0xFF`), so its own
    * reader also mis-parses multibyte text — the de-facto format is
    * ASCII-only. Interop with reference-written files is exact for ASCII
    * strings; non-ASCII files are broken on BOTH implementations.
    * Rows stream through the driver
    * (`toLocalIterator` — one partition in memory at a time): the
    * single-file global footer makes this inherently a gather point,
    * exactly as the single-node reference behaves. */
  def write(df: DataFrame, path: String,
            rowsPerBlock: Int = 2 * 1024 * 1024): Unit = {
    validateWritable(df.schema, rowsPerBlock)
    // an overwrite invalidates any zone-map sidecar BEFORE the file
    // changes (ZoneMap.load's length/offset guard is the backstop)
    new java.io.File(ZoneMap.sidecar(path)).delete(): Unit
    val os = new FileOutputStream(path)
    try writeTo(os, df.schema,
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        microsView(df).toLocalIterator()).asScala, rowsPerBlock)
    finally os.close()
  }

  private def validateWritable(schema: StructType, rowsPerBlock: Int): Unit = {
    require(rowsPerBlock >= 1, s"rowsPerBlock must be >= 1, got $rowsPerBlock")
    require(schema.length < 0xFF,
      s"BlockFile holds at most 254 columns (io.py MAX_COLUMNS), got ${schema.length}")
    schema.fields.foreach(f => ordinalOf(f.dataType)) // validate up front
  }

  /** Stream one complete BlockFile (header + blocks + footer) to an
    * output stream — the shared core of the driver-side [[write]] and
    * the per-task writers of [[writeDir]]. Rows must already be in the
    * micros iteration shape ([[microsView]]). */
  private[sources] def writeTo(os: java.io.OutputStream, schema: StructType,
                               it: Iterator[org.apache.spark.sql.Row],
                               rowsPerBlock: Int): Unit = {
    val out = new java.io.DataOutputStream(new BufferedOutputStream(os))
    var offset = 0L
    def writeBytes(b: Array[Byte]): Unit = { out.write(b); offset += b.length }
    // header
    writeBytes(Array(schema.length.toByte))
    schema.fields.foreach { f =>
      val name = f.name.getBytes("UTF-8")
      require(name.length < MaxStrLength, s"column name too long: ${f.name}")
      writeBytes(Array(ordinalOf(f.dataType).toByte, name.length.toByte))
      writeBytes(name)
    }
    val blockOffsets = ListBuffer.empty[Long]
    // growable buffer, not Array(rowsPerBlock): at the 2M-row default a
    // pre-sized array per writeDir TASK would pin 16 MB of refs × cores
    val block = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
    def flushBlock(): Unit = if (block.nonEmpty) {
      blockOffsets += offset
      writeBytes(encodeBlock(schema, block, block.length))
      block.clear()
    }
    while (it.hasNext) {
      block += it.next()
      if (block.length == rowsPerBlock) flushBlock()
    }
    flushBlock()
    // footer
    blockOffsets.foreach(o => writeBytes(u64Bytes(o)))
    writeBytes(u32Bytes(blockOffsets.length))
    out.flush()
  }

  /** PARALLEL directory-of-blocks writer: every input partition writes
    * its own `part-NNNNN.bin` — a complete, self-describing BlockFile —
    * directly from its task, so large exports never stream through the
    * driver (the single-FILE [[write]] stays the interchange path; its
    * global footer makes it inherently a gather point). The DSv2 reader
    * treats the directory as ONE table: partitions = all blocks of all
    * parts in name order, same pruning, same COUNT(*) pushdown. Each
    * part also loads individually in the reference engine (it is just a
    * BlockFile). The path must be on a filesystem every executor can
    * reach (local[*]/NFS here; the format is the single-node
    * reference's, parquet is the at-scale storage).
    *
    * Empty input partitions write no file; a fully empty frame leaves
    * one zero-block part so the table stays readable. */
  def writeDir(df: DataFrame, path: String,
               rowsPerBlock: Int = 2 * 1024 * 1024): Unit = {
    val schema = df.schema
    validateWritable(schema, rowsPerBlock)
    val dir = new java.io.File(path)
    if (dir.exists()) {
      require(dir.isDirectory, s"writeDir target $path exists and is a file " +
        "(use write() for the single-file form)")
      // UN-COMMIT FIRST: the marker must be gone before any old part is
      // deleted — a crash mid-sweep must leave an uncommitted (refused)
      // directory, never a marker-committed truncated one. A FAILED
      // delete must abort for the same reason (proceeding would run the
      // whole job with the marker still present).
      val marker = new java.io.File(dir, SuccessMarker)
      require(!marker.exists() || marker.delete(),
        s"could not un-commit $path before overwrite")
      Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.endsWith(".bin") ||
          f.getName.endsWith(".bin.zones") || // sidecars of swept parts
          f.getName.contains(".bin.tmp-")) // stale attempt temps too
        .foreach(_.delete())
    } else require(dir.mkdirs(), s"cannot create directory $path")
    val rpb = rowsPerBlock
    val dirPath = dir.getAbsolutePath
    val written = microsView(df).rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        // task-atomic: write an attempt-unique temp (never matched by
        // partFiles), then rename into place — a speculative or retried
        // attempt cannot interleave bytes into the final part, and the
        // last completed attempt wins with a whole file either way
        val tmp = new java.io.File(dirPath,
          f".part-$idx%05d.bin.tmp-${java.util.UUID.randomUUID()}")
        val os = new FileOutputStream(tmp)
        try writeTo(os, schema, it, rpb) finally os.close()
        java.nio.file.Files.move(tmp.toPath,
          new java.io.File(dirPath, f"part-$idx%05d.bin").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(1)
      }
    }.count()
    if (written == 0) {
      val os = new FileOutputStream(new java.io.File(dir, "part-00000.bin"))
      try writeTo(os, schema, Iterator.empty, rowsPerBlock) finally os.close()
    }
    // sweep temps orphaned by failed attempts whose retry succeeded (a
    // killed attempt dies between open and rename; nothing else would
    // ever delete its attempt-unique file)
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.contains(".bin.tmp-")).foreach(_.delete())
    // job-atomic: the marker commits the table — a job that died after
    // some tasks finished leaves parts but no marker, and the reader
    // REFUSES the directory instead of serving a silently truncated
    // table (the _SUCCESS convention of Spark's own file sinks)
    require(new java.io.File(dir, SuccessMarker).createNewFile(),
      s"could not commit $path (marker exists or is not writable)")
  }

  /** Job-commit marker of [[writeDir]] (the `_SUCCESS` convention). */
  private[graft] val SuccessMarker = "_SUCCESS"

  /** The append schema gate, shared by the single-file body and the
    * directory pre-check (which must reject BEFORE un-committing). */
  private def requireAppendCompatible(schema: StructType,
                                      fileSchema: StructType): Unit =
    require(schema.length == fileSchema.length &&
      schema.fields.zip(fileSchema.fields).forall { case (a, b) =>
        a.name == b.name && ordinalOf(a.dataType) == ordinalOf(b.dataType) },
      s"append schema mismatch: file has ${fileSchema.simpleString}, " +
      s"frame has ${schema.simpleString}")

  /** Read a BlockFile as a DataFrame via the DSv2 source (one partition
    * per block, column pruning through the size prefixes). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(classOf[BlockFileSource].getName).load(path)

  private def u32Bytes(v: Int): Array[Byte] = ByteBuffer.allocate(4)
    .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def u64Bytes(v: Long): Array[Byte] = ByteBuffer.allocate(8)
    .order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** Encode rows [0, n) of `block` as ONE on-disk block (io.py:74-109):
    * u32 row count, then per column u64 byte size + contiguous values.
    * Timestamp columns must already be iterated as epoch-micros longs
    * (the write/append drivers select via [[microsView]] first). */
  private def encodeBlock(schema: StructType,
                          block: collection.Seq[org.apache.spark.sql.Row],
                          n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32Bytes(n))
    schema.fields.zipWithIndex.foreach { case (field, ci) =>
      val body: Array[Byte] = (field.dataType match {
        case TimestampNTZType => TimestampType // iterated as micros
        case dt               => dt
      }) match {
        case IntegerType =>
          val bb = ByteBuffer.allocate(4 * n).order(ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach(i => bb.putInt(block(i).getInt(ci)))
          bb.array()
        case FloatType =>
          val bb = ByteBuffer.allocate(4 * n).order(ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach(i => bb.putFloat(block(i).getFloat(ci)))
          bb.array()
        case TimestampType =>
          val bb = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach(i => bb.putLong(block(i).getLong(ci)))
          bb.array()
        case StringType =>
          val encoded = (0 until n).map { i =>
            val b = block(i).getString(ci).getBytes("UTF-8")
            require(b.length < MaxStrLength,
              s"string over ${MaxStrLength - 1} UTF-8 bytes in '${field.name}'")
            b
          }
          val total = encoded.map(_.length).sum
          val bb = ByteBuffer.allocate(n + total)
          encoded.foreach(b => bb.put(b.length.toByte))
          encoded.foreach(bb.put)
          bb.array()
        case other => throw new IllegalStateException(other.toString)
      }
      out.write(u64Bytes(body.length.toLong))
      out.write(body)
    }
    out.toByteArray
  }

  /** Select `df` into the iteration shape the block encoder expects:
    * timestamps as epoch-micros LONGS (Spark's internal form via
    * unix_micros) — no driver-side calendar arithmetic. */
  private def microsView(df: DataFrame): DataFrame = {
    val schema = df.schema
    df.select(schema.fields.map { fld =>
      if (fld.dataType == TimestampType || fld.dataType == TimestampNTZType)
        org.apache.spark.sql.functions.unix_micros(org.apache.spark.sql
          .functions.col(fld.name).cast(TimestampType)).as(fld.name)
      else org.apache.spark.sql.functions.col(fld.name)
    }.toIndexedSeq: _*)
  }

  /** Decode the block at `offset` into driver rows in the WRITE loop's
    * value shape (Int / Float / Long micros / String) — the merge
    * prefix for [[append]]. Bounded by the block cap. */
  private def decodeBlockRows(f: RandomAccessFile, offset: Long,
                              schema: StructType): Array[org.apache.spark.sql.Row] = {
    f.seek(offset)
    val rows = readU32(f)
    val cols = schema.fields.map { field =>
      val size = readU64(f)
      val body = new Array[Byte](size.toInt)
      f.readFully(body)
      val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Any](rows)
      (field.dataType match {
        case TimestampNTZType => TimestampType
        case dt               => dt
      }) match {
        case IntegerType   => (0 until rows).foreach(i => out(i) = bb.getInt())
        case FloatType     => (0 until rows).foreach(i => out(i) = bb.getFloat())
        case TimestampType => (0 until rows).foreach(i => out(i) = bb.getLong())
        case StringType =>
          val lens = new Array[Int](rows)
          (0 until rows).foreach(i => lens(i) = bb.get() & 0xFF)
          (0 until rows).foreach { i =>
            val s = new Array[Byte](lens(i)); bb.get(s)
            out(i) = new String(s, "UTF-8")
          }
        case other => throw new IllegalStateException(other.toString)
      }
      out
    }
    Array.tabulate(rows)(i =>
      org.apache.spark.sql.Row.fromSeq(cols.toIndexedSeq.map(_(i))))
  }

  /** APPEND `df` to an existing BlockFile, merging into the final block
    * while it is under `rowsPerBlock` — the reference writer's format
    * invariant (io.py:231-252, tested at tests/test_io.py:75-98): an
    * under-full last block absorbs new rows (re-split at the cap) so
    * repeated small appends cannot accumulate tiny blocks. Schema must
    * equal the file's header schema (asserted, like the reference).
    * A missing or zero-block file degrades to [[write]] (io.py:233-234).
    *
    * DIVERGENCE (deliberate): when the last block is exactly full, the
    * reference seeks `-8*(nblocks+1)` from EOF (io.py:245) — but its
    * footer is `8*nblocks + 4` bytes, so it lands 4 bytes INSIDE the
    * last block and corrupts that block's final 4 data bytes (its own
    * test asserts only row COUNTS, tests/test_io.py:75-98, so the bug
    * survives there). We seek to the true footer start; row and block
    * counts match the reference exactly, values stay intact. */
  def append(df: DataFrame, path: String,
             rowsPerBlock: Int = 2 * 1024 * 1024): Unit = {
    require(rowsPerBlock >= 1, s"rowsPerBlock must be >= 1, got $rowsPerBlock")
    val f0 = new java.io.File(path)
    // DIRECTORY form: the merge invariant applies at the table's append
    // BOUNDARY — the last part file absorbs new rows into its under-full
    // tail block exactly like the single-file form. Earlier parts' tail
    // blocks keep their (parallel-write) sizes, the same way parquet
    // part files keep their final row groups.
    if (f0.isDirectory) {
      val marker = new java.io.File(f0, SuccessMarker)
      val parts = partFiles(f0) // ONE listing: emptiness decision and
                                // append target share the same snapshot
      if (parts.isEmpty) {
        validateWritable(df.schema, rowsPerBlock)
        // a stale marker (e.g. hand-created before the parts arrived)
        // must be gone while the part streams in — same un-commit-first
        // rule as writeDir's overwrite
        require(!marker.exists() || marker.delete(),
          s"could not un-commit $path for first append")
        val os = new FileOutputStream(new java.io.File(f0, "part-00000.bin"))
        try writeTo(os, df.schema,
          scala.jdk.CollectionConverters.IteratorHasAsScala(
            microsView(df).toLocalIterator()).asScala, rowsPerBlock)
        finally os.close()
        // first content in a bare directory: commit it (writeDir's
        // marker contract — the reader refuses unmarked directories)
        require(marker.createNewFile(), s"could not commit $path")
      } else {
        // only a COMMITTED directory may be appended to (extending a
        // truncated failed write would launder it into a "complete"
        // table), and the mutation itself runs UN-COMMITTED: the last
        // part's tail block + footer are rewritten in place, so a crash
        // mid-append must leave a refused directory, not a
        // marker-committed part with a garbage footer
        require(marker.exists(),
          s"BlockFile directory $path is not committed (no $SuccessMarker " +
          "marker); refusing to append to a possibly truncated table")
        // validate EVERYTHING that can reject BEFORE un-committing — a
        // schema-mismatch append must leave an intact table committed
        requireAppendCompatible(df.schema, readSchema(parts.last.getPath))
        require(marker.delete(), s"could not un-commit $path for append")
        append(df, parts.last.getPath, rowsPerBlock)
        require(marker.createNewFile(), s"could not re-commit $path")
      }
      return
    }
    if (!f0.exists()) { write(df, path, rowsPerBlock); return }
    val fileSchema = readSchema(path)
    val schema = df.schema
    requireAppendCompatible(schema, fileSchema)
    val starts = blockStarts(path)
    if (starts.isEmpty) { write(df, path, rowsPerBlock); return }
    // the in-place mutation invalidates the sidecar — delete it FIRST
    // so a crash mid-append cannot leave a sidecar describing a
    // half-written footer (the load-time guard is the backstop)
    new java.io.File(ZoneMap.sidecar(path)).delete(): Unit
    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.seek(starts.last)
      val lastRows = readU32(raf)
      val merge = lastRows < rowsPerBlock
      val prefix: Array[org.apache.spark.sql.Row] =
        if (merge) decodeBlockRows(raf, starts.last, fileSchema)
        else Array.empty
      val keptOffsets = if (merge) starts.dropRight(1) else starts
      // footer start = EOF - 8*nblocks - 4 (see divergence note above)
      val writeStart =
        if (merge) starts.last else raf.length() - 8L * starts.length - 4
      raf.seek(writeStart)
      var offset = writeStart
      val newOffsets = ListBuffer.empty[Long]
      newOffsets ++= keptOffsets
      val it = prefix.iterator ++
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          microsView(df).toLocalIterator()).asScala
      val block = new Array[org.apache.spark.sql.Row](rowsPerBlock)
      var n = 0
      def flushBlock(): Unit = if (n > 0) {
        val bytes = encodeBlock(schema, block, n)
        newOffsets += offset
        raf.write(bytes)
        offset += bytes.length
        n = 0
      }
      while (it.hasNext) {
        block(n) = it.next(); n += 1
        if (n == rowsPerBlock) flushBlock()
      }
      flushBlock()
      newOffsets.foreach(o => raf.write(u64Bytes(o)))
      raf.write(u32Bytes(newOffsets.length))
      offset += 8L * newOffsets.length + 4
      raf.setLength(offset)
    } finally raf.close()
  }
}

/** DSv2 entry point: `spark.read.format(classOf[BlockFileSource].getName)
  * .load(path)`. */
final class BlockFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockFile.readSchema(options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new BlockFileTable(properties.get("path"), schema)
  override def supportsExternalMetadata(): Boolean = false
}

final class BlockFileTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"blockfile($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockFileScanBuilder(path, schema0)
}

final class BlockFileScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = full
  private var countStar = false
  private var zoneFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  // Zone-map pruning: remember the numeric comparison conjuncts for
  // block skipping at planning time, but return EVERY filter as
  // residual — the sidecar decides which blocks are READ, never which
  // rows match, so Spark re-evaluates all predicates post-scan and a
  // missing/stale sidecar degrades to a full scan, not wrong rows.
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    zoneFilters = filters.filter(ZoneMap.usable)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    zoneFilters
  // keep FILE order for the pruned schema: the reader walks columns
  // sequentially, skipping unwanted ones by their size prefix
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }
  // COUNT(*) answers from the BLOCK HEADERS alone: every block leads
  // with its u32 row count, so a bare count is footer + one u32 per
  // block — zero column bytes read. Spark only offers the aggregation
  // when it sits directly on the scan (residual filters block it), so
  // complete pushdown is safe; anything beyond a bare ungrouped
  // COUNT(*) is declined and planned normally.
  private def bareCountStar(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    bareCountStar(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (bareCountStar(agg)) { countStar = true; true } else false
  }
  override def build(): Scan =
    if (countStar) new BlockFileCountScan(path, full)
    else new BlockFileScan(path, full, required, zoneFilters.toSeq)
}

/** COUNT(*) served from block metadata: one task walks the footer's
  * block offsets and sums each block's leading u32 row count — the scan
  * that never opens a column. */
final class BlockFileCountScan(path: String, full: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", org.apache.spark.sql.types.LongType,
      nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"BlockFileCountScan(path=$path)"
  // same commit-marker + inter-part schema gate as the row scan: a
  // drifted/foreign part must fail COUNT(*) too, not be silently
  // counted into the total. The VALIDATED file list is snapshotted into
  // the partition — execution must count exactly the files planning
  // checked, not re-list a directory that may have changed in between
  override def planInputPartitions(): Array[InputPartition] =
    Array(BlockFileCountPartition(BlockFile.validatedScanFiles(path, full)))
  override def createReaderFactory(): PartitionReaderFactory =
    new BlockFileCountReaderFactory
}

final case class BlockFileCountPartition(paths: Seq[String])
    extends InputPartition

final class BlockFileCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val paths = p.asInstanceOf[BlockFileCountPartition].paths
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow = {
        val total = paths.map { fp =>
          val f = new RandomAccessFile(fp, "r")
          try BlockFile.blockStarts(fp).map { off =>
            f.seek(off)
            val b = new Array[Byte](4); f.readFully(b)
            ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong
          }.sum
          finally f.close()
        }.sum
        new GenericInternalRow(Array[Any](total))
      }
      override def close(): Unit = ()
    }
}

final class BlockFileScan(path: String, full: StructType, required: StructType,
                          zoneFilters: Seq[org.apache.spark.sql.sources.Filter]
                            = Seq.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BlockFileScan(path=$path, columns=${required.fieldNames.mkString(",")})"
  // one partition per SURVIVING block: a block whose sidecar ranges
  // prove no row can match every zone filter is never scheduled (the
  // sidecar is validated against the file's current length and footer
  // offsets — see ZoneMap.load — so drift degrades to the full scan)
  override def planInputPartitions(): Array[InputPartition] =
    BlockFile.validatedScanFiles(path, full).flatMap { fp =>
      val starts = BlockFile.blockStarts(fp)
      val zones =
        if (zoneFilters.isEmpty) None else ZoneMap.load(fp, starts)
      starts
        .filter(off => zones.forall(z => ZoneMap.mayMatch(z(off), zoneFilters)))
        .map(off => BlockFilePartition(fp, off): InputPartition)
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new BlockFileReaderFactory(full, required)
}

final case class BlockFilePartition(path: String, offset: Long)
    extends InputPartition

final class BlockFileReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlockFilePartition]
    new BlockFileBlockReader(p.path, p.offset, full, required)
  }
}

/** Reads ONE block: seeks to the block start, walks the columns in file
  * order reading the required ones and seeking past the rest via their
  * u64 size prefix (the pruning path), then emits rows. Block size is
  * bounded by the writer (reference cap: 2M rows), so a columnar
  * buffer per task is the same memory shape the reference's executor
  * uses (one block per job, plan.py:90-93). */
final class BlockFileBlockReader(path: String, offset: Long,
                                 full: StructType, required: StructType)
    extends PartitionReader[InternalRow] {
  private val f = new RandomAccessFile(path, "r")
  private val rows: Int = { f.seek(offset); readU32() }
  private val wanted = required.fieldNames.toSet
  // file-order walk with skip-by-size; store column vectors by name
  private val vectors: Map[String, Array[Any]] = {
    val m = scala.collection.mutable.Map.empty[String, Array[Any]]
    full.fields.foreach { field =>
      val size = readU64()
      if (!wanted.contains(field.name)) f.seek(f.getFilePointer + size)
      else {
        val body = new Array[Byte](size.toInt)
        f.readFully(body)
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Any](rows)
        field.dataType match {
          case IntegerType   => (0 until rows).foreach(i => out(i) = bb.getInt())
          case FloatType     => (0 until rows).foreach(i => out(i) = bb.getFloat())
          case TimestampType => (0 until rows).foreach(i => out(i) = bb.getLong())
          case StringType =>
            val lens = new Array[Int](rows)
            (0 until rows).foreach(i => lens(i) = bb.get() & 0xFF)
            (0 until rows).foreach { i =>
              val s = new Array[Byte](lens(i)); bb.get(s)
              out(i) = UTF8String.fromBytes(s)
            }
          case other => throw new IllegalStateException(other.toString)
        }
        m(field.name) = out
      }
    }
    m.toMap
  }
  private val cols = required.fieldNames.map(vectors)
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows }
  override def get(): InternalRow =
    new GenericInternalRow(cols.map(_(i)).toArray)
  override def close(): Unit = f.close()

  private def readU32(): Int = {
    val b = new Array[Byte](4); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }
  private def readU64(): Long = {
    val b = new Array[Byte](8); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }
}
