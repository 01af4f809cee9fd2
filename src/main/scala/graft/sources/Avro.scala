package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro Object Container File read/write — THE row-oriented interchange
  * format of data engineering (Kafka archives, Sqoop/ETL drops, schema-
  * registry pipelines all hand corpora over as `.avro`). Implemented
  * against the Avro CORE library only (`org.apache.avro`, already on
  * Spark's runtime classpath — no spark-avro module, no new
  * dependency): an OCF is `magic Obj | metadata (writer schema
  * JSON + codec) | 16-byte sync marker | blocks of
  * (count, byte-length, deflate/null-compressed records, sync)`.
  *
  * Processing model: the writer schema travels IN the file, so [[read]]
  * resolves it from the first file's HEADER on the driver (metadata
  * only — no record decode), maps it to a Spark schema, and executors
  * stream-decode records one at a time (one record in memory, the
  * [[Warc]]/[[TfRecord]] model). Parallelism is SYNC-ALIGNED
  * BYTE-RANGE granular: files above `maxSplitBytes` split on the
  * format's own 16-byte sync markers (`DataFileReader.sync` /
  * `pastSync` — OCF was designed for exactly this), so a single
  * multi-GB Kafka-archive shard reads on every core; small files stay
  * one task each.
  *
  * Type surface: the flat primitive subset corpora use — boolean, int,
  * long, float, double, string, bytes, timestamp (long +
  * `timestamp-micros` logical type on write; micros OR millis logical
  * types on read), arrays of those, each
  * optionally nullable as `union[null, T]`. Records-in-records, maps,
  * enums and fixed reject LOUDLY at schema-mapping time: silently
  * flattening nested payloads is how a pipeline ships garbage columns.
  *
  * Reference: minispark reads CSV and its native block format only
  * (src/mini_spark/io.py) — Avro is a beyond-reference source.
  */
object Avro {

  /** Spark -> Avro schema for the supported flat subset. Nullable
    * fields become `union[null, T]` (null first, Avro's convention). */
  def avroSchemaFor(schema: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      // the dialect's own temporal core type (reference constants.py:22):
      // Avro's standard encoding is long + the timestamp-micros logical
      // type — exactly TimestampType's microsecond precision, lossless
      // both directions
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(
          Schema.create(Schema.Type.LONG))
      // NTZ (wall-clock) timestamps — what the testdata parquet carries —
      // map to Avro's local-timestamp-micros, the zone-free twin
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(
          Schema.create(Schema.Type.LONG))
      case other => throw new IllegalArgumentException(
        s"Avro writer supports flat primitives and arrays of them; got $other")
    }
    val fields = SchemaBuilder.record(name).fields()
    schema.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case ArrayType(et, _) => Schema.createArray(prim(et))
        case dt => prim(dt)
      }
      val s =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      fs.name(f.name).`type`(s).noDefault()
    }.endRecord()
  }

  /** Avro -> Spark schema for the supported subset; loud on the rest. */
  def sparkSchemaFor(schema: Schema): StructType = {
    def field(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(branches.size == nonNull.size + 1 && nonNull.size == 1,
          s"Avro reader supports only union[null, T] nullability; got $s")
        (field(nonNull.head)._1, true)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT     => (IntegerType, false)
      // millis-precision variants (Kafka Connect's default) read fine:
      // the value converter widens millis -> micros losslessly
      case Schema.Type.LONG
          if s.getLogicalType != null &&
             Set("timestamp-micros", "timestamp-millis")(
               s.getLogicalType.getName) =>
        (TimestampType, false)
      case Schema.Type.LONG
          if s.getLogicalType != null &&
             Set("local-timestamp-micros", "local-timestamp-millis")(
               s.getLogicalType.getName) =>
        (TimestampNTZType, false)
      case Schema.Type.LONG    => (LongType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case Schema.Type.ARRAY =>
        val (et, en) = field(s.getElementType)
        (ArrayType(et, containsNull = en), false)
      case other => throw new IllegalArgumentException(
        s"Avro reader supports flat primitives and arrays of them; " +
          s"got $other in $s")
    }
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record; got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    // timestamp-micros: epoch micros as long (floorDiv keeps pre-1970
    // instants exact — a truncating divide would round them toward zero)
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    // NTZ rows surface as LocalDateTime; local-timestamp-micros is
    // epoch micros of the same wall-clock read at UTC
    case t: java.time.LocalDateTime =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000L
    case seq: scala.collection.Seq[_] => seq.map(toAvroValue).asJava
    case other => other
  }

  /** Micros per encoded unit for a field's timestamp logical type
    * (1000 for `timestamp-millis`, else 1) — drills through the
    * nullable union and array element wrappers. */
  private def tsUnitMicros(s: Schema): Long = {
    val base = s.getType match {
      case Schema.Type.UNION =>
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
      case _ => s
    }
    base.getType match {
      case Schema.Type.ARRAY => tsUnitMicros(base.getElementType)
      case _ =>
        if (Option(base.getLogicalType)
              .exists(_.getName.endsWith("timestamp-millis"))) 1000L
        else 1L
    }
  }

  private def toSparkValue(v: Any, dt: DataType, tsUnit: Long = 1L): Any =
    (v, dt) match {
      case (null, _) => null
      case (s: org.apache.avro.util.Utf8, StringType) => s.toString
      case (s: CharSequence, StringType) => s.toString
      case (b: java.nio.ByteBuffer, BinaryType) =>
        val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
      case (l: java.lang.Long, TimestampType) =>
        val micros = l * tsUnit
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case (l: java.lang.Long, TimestampNTZType) =>
        val micros = l * tsUnit
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case (l: java.util.Collection[_], ArrayType(et, _)) =>
        l.asScala.toSeq.map(toSparkValue(_, et, tsUnit))
      case (other, _) => other
    }

  /** Write `rows` as one OCF shard to a LOCAL file — the executor-side
    * writer ([[graft.sources.TfRecord]]'s sharding model: call from
    * `foreachPartition`, one file per task). `codec` is `"null"`,
    * `"deflate"` or `"snappy"`. */
  def writeFile(file: java.io.File, schema: StructType,
                rows: Iterator[Row], codec: String = "deflate"): Long = {
    val avroSchema = avroSchemaFor(schema)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setCodec(codec match {
      case "null"    => CodecFactory.nullCodec()
      case "deflate" => CodecFactory.deflateCodec(6)
      case "snappy"  => CodecFactory.snappyCodec()
      case other => throw new IllegalArgumentException(
        s"unsupported Avro codec '$other' (null|deflate|snappy)")
    })
    writer.create(avroSchema, file)
    var n = 0L
    try {
      rows.foreach { r =>
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < schema.length) {
          rec.put(i, toAvroValue(r.get(i)))
          i += 1
        }
        writer.append(rec)
        n += 1
      }
    } finally writer.close()
    n
  }

  /** The writer schema of the FIRST file under `path` (glob ok),
    * decoded from its OCF header — metadata only, no record reads. */
  def writerSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val first = fs.globStatus(p) match {
      case null | Array() => throw new IllegalArgumentException(
        s"no Avro files match $path")
      case matches =>
        val files = matches.flatMap { st =>
          if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
          else Array(st)
        }.map(_.getPath).sortBy(_.toString)
        require(files.nonEmpty, s"no Avro files match $path")
        files.head
    }
    val in = fs.open(first)
    try {
      val stream = new DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      val s = stream.getSchema
      stream.close()
      s
    } finally in.close()
  }

  /** Sync-aligned byte-range splits over a glob of OCF files: every
    * file larger than `maxSplitBytes` shatters into ranges, smaller
    * files are one range each. Ownership follows the convention the
    * format was DESIGNED for (it is how Hadoop's AvroInputFormat
    * splits): a reader seeks to the first 16-byte SYNC MARKER after
    * its range start (`DataFileReader.sync`) and decodes blocks until
    * the first sync past its range end (`pastSync`) — every block is
    * owned by exactly one range, no coordination. */
  private[graft] def planSplits(spark: SparkSession, path: String,
      maxSplitBytes: Long): Seq[(String, Long, Long)] = {
    require(maxSplitBytes >= 1, s"maxSplitBytes must be >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
        else Array(st)
      }.sortBy(_.getPath.toString)
    require(files.nonEmpty, s"no Avro files match $path")
    files.toSeq.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      val step = (len + n - 1) / n
      (0L until n).map(i =>
        (st.getPath.toString, i * step, math.min(len, (i + 1) * step)))
    }
  }

  /** Read a glob of `.avro` OCF files: schema from the first file's
    * header, then one streaming task per SYNC-ALIGNED BYTE RANGE —
    * files above `maxSplitBytes` split on the format's own sync
    * markers ([[planSplits]]), so a single multi-GB Kafka-archive
    * shard reads on every core instead of serializing on one (the
    * header's "upgrade path", now the default path). A file whose
    * writer schema differs from the resolved one fails ITS task loudly
    * (no silent column drift mid-corpus); corrupted blocks raise
    * through the Avro decoder the same way. */
  def read(spark: SparkSession, path: String,
           maxSplitBytes: Long = 32L * 1024 * 1024): DataFrame = {
    val wSchema = writerSchema(spark, path)
    val sparkSchema = sparkSchemaFor(wSchema)
    val expected = sparkSchema.map(f => (f.name, f.dataType)).toIndexedSeq
    val types = sparkSchema.map(_.dataType).toIndexedSeq
    val splits = planSplits(spark, path, maxSplitBytes)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (file, start, end) =>
        val in = new org.apache.avro.mapred.FsInput(
          new org.apache.hadoop.fs.Path(file), confBc.value.value)
        val reader = org.apache.avro.file.DataFileReader.openReader(
          in, new GenericDatumReader[GenericRecord]())
        val fileSchema = reader.getSchema
        val got = sparkSchemaFor(fileSchema)
          .map(f => (f.name, f.dataType)).toIndexedSeq
        require(got == expected,
          s"Avro schema drift in $file: $got vs resolved $expected")
        // timestamp unit per field comes from THIS file's writer schema:
        // timestamp-millis and timestamp-micros both surface as Spark
        // TimestampType, so the drift check above can't see a unit mix —
        // a glob of Kafka-Connect (millis) + Spark (micros) shards must
        // decode each file by its own units, not the first file's
        val units = fileSchema.getFields.asScala
          .map(f => tsUnitMicros(f.schema())).toIndexedSeq
        reader.sync(start) // first sync point at/after the range start
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) reader.close()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(types.indices.map(i =>
              toSparkValue(rec.get(i), types(i), units(i))))
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
