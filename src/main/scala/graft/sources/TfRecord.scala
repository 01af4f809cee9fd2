package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord ingestion and export — the interchange format the TRAINING
  * side of a data pipeline actually consumes: a TFRecord file is a
  * sequence of `u64le length | masked-crc32c(length) | payload |
  * masked-crc32c(payload)` frames, each payload a serialized
  * `tf.Example` protobuf (Features → map<name, Feature> → one of
  * bytes_list / float_list / int64_list). Both layers are implemented
  * from the WIRE FORMATS — the record framing with real CRC32C
  * validation (JDK-native `java.util.zip.CRC32C`, TF's mask rotation),
  * and a minimal protobuf walk for exactly the fixed tf.Example
  * schema. Same processing model as [[Warc]]/[[Archives]]: the format
  * is not byte-splittable (no sync markers), so parallelism is
  * file-granular, exactly how training corpora shard (thousands of
  * `.tfrecord` files per dataset).
  *
  * Reference: minispark has no TFRecord support — the beyond-reference
  * source that closes the loop from curation to the trainer's reader.
  */
object TfRecord {

  /** One row per (record, feature): long/float features surface as
    * arrays, bytes features as UTF-8 text (the corpus case). `rec_idx`
    * is the record's ordinal within its file. */
  val schema: StructType = StructType(Seq(
    StructField("tf_file", StringType, nullable = false),
    StructField("rec_idx", LongType, nullable = false),
    StructField("feature", StringType, nullable = false),
    StructField("text_val", StringType, nullable = true),
    StructField("int_vals", ArrayType(LongType, containsNull = false),
      nullable = true),
    StructField("float_vals", ArrayType(FloatType, containsNull = false),
      nullable = true)))

  /** TF's masked CRC32C: rotate right 15 and add the fixed constant. */
  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Read a directory/glob of `.tfrecord` files — one task per file,
    * streaming frame walk with CRC validation: a record whose length
    * or payload CRC mismatches ends the walk (corruption has no
    * resync point in this format — trailing salvage, like the other
    * non-splittable readers); records whose payload does not parse as
    * a tf.Example are skipped. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = new java.io.BufferedInputStream(pds.open(), 65536)
        new Iterator[Seq[Row]] {
          private var idx = -1L
          private var nextRec: Option[Array[Byte]] = advance()
          private def advance(): Option[Array[Byte]] = {
            val hdr = in.readNBytes(12)
            if (hdr.length < 12) { in.close(); return None }
            val len = java.nio.ByteBuffer.wrap(hdr, 0, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
            val lenCrc = java.nio.ByteBuffer.wrap(hdr, 8, 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
            if (len < 0 || len > Int.MaxValue - 8 ||
                maskedCrc(hdr, 0, 8) != lenCrc) { in.close(); return None }
            val payload = in.readNBytes(len.toInt)
            val dataCrcBytes = in.readNBytes(4)
            if (payload.length < len || dataCrcBytes.length < 4) {
              in.close(); return None
            }
            val dataCrc = java.nio.ByteBuffer.wrap(dataCrcBytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
            if (maskedCrc(payload, 0, payload.length) != dataCrc) {
              in.close(); return None
            }
            idx += 1
            Some(payload)
          }
          override def hasNext: Boolean = nextRec.nonEmpty
          override def next(): Seq[Row] = {
            val payload = nextRec.get
            val i = idx
            nextRec = advance()
            parseExample(payload).toSeq.flatMap(_.map {
              case (name, (txt, ints, floats)) =>
                Row(file, i, name, txt.orNull,
                  ints.orNull, floats.orNull)
            })
          }
        }.flatten
      }
    spark.createDataFrame(rows, schema)
  }

  // ---- minimal protobuf wire-format walk for the fixed tf.Example
  //      schema: Example{1: Features}, Features{1: map<string,Feature>}
  //      (map entries: {1: key, 2: value}), Feature{1: BytesList,
  //      2: FloatList, 3: Int64List}, each list{1: repeated values} ----

  private final class Pb(b: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L; var shift = 0
      var more = true
      while (more) {
        val c = b(pos); pos += 1
        v |= (c & 0x7FL) << shift; shift += 7
        more = (c & 0x80) != 0
        if (shift > 63 && more) throw new IndexOutOfBoundsException("varint")
      }
      v
    }
    /** (fieldNumber, wireType) or None at end */
    def tag(): Option[(Int, Int)] =
      if (pos >= end) None
      else { val t = varint(); Some(((t >>> 3).toInt, (t & 7).toInt)) }
    def lenDelim(): (Int, Int) = {
      val n = varint().toInt
      val s = pos
      if (n < 0 || s + n > end) throw new IndexOutOfBoundsException("len")
      pos = s + n
      (s, s + n)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => lenDelim(): Unit
      case 5 => pos += 4
      case _ => throw new IndexOutOfBoundsException(s"wire $wire")
    }
  }

  private type FeatureVals =
    (Option[String], Option[Seq[Long]], Option[Seq[Float]])

  /** Parse a serialized tf.Example into (name → values); None when the
    * bytes are not an Example-shaped message — never throws. */
  def parseExample(payload: Array[Byte])
      : Option[Seq[(String, FeatureVals)]] =
    try {
      val ex = new Pb(payload, 0, payload.length)
      var features: Option[(Int, Int)] = None
      var t = ex.tag()
      while (t.nonEmpty) {
        t.get match {
          case (1, 2) => features = Some(ex.lenDelim())
          case (_, w) => ex.skip(w)
        }
        t = ex.tag()
      }
      features.map { case (fs, fe) =>
        val out = scala.collection.mutable.ListBuffer.empty[(String, FeatureVals)]
        val fp = new Pb(payload, fs, fe)
        var ft = fp.tag()
        while (ft.nonEmpty) {
          ft.get match {
            case (1, 2) => // one map entry: {1: key, 2: Feature}
              val (es, ee) = fp.lenDelim()
              val ep = new Pb(payload, es, ee)
              var key = ""
              var vals: FeatureVals = (None, None, None)
              var et = ep.tag()
              while (et.nonEmpty) {
                et.get match {
                  case (1, 2) =>
                    val (ks, ke) = ep.lenDelim()
                    key = new String(payload, ks, ke - ks, "UTF-8")
                  case (2, 2) =>
                    val (vs, ve) = ep.lenDelim()
                    vals = parseFeature(payload, vs, ve)
                  case (_, w) => ep.skip(w)
                }
                et = ep.tag()
              }
              out += ((key, vals))
            case (_, w) => fp.skip(w)
          }
          ft = fp.tag()
        }
        out.toSeq
      }
    } catch { case _: IndexOutOfBoundsException => None }

  private def parseFeature(b: Array[Byte], s: Int, e: Int): FeatureVals = {
    val p = new Pb(b, s, e)
    var txt: Option[String] = None
    var ints: Option[Seq[Long]] = None
    var floats: Option[Seq[Float]] = None
    var t = p.tag()
    while (t.nonEmpty) {
      t.get match {
        case (1, 2) => // BytesList{1: repeated bytes}
          val (ls, le) = p.lenDelim()
          val lp = new Pb(b, ls, le)
          var lt = lp.tag()
          while (lt.nonEmpty) {
            lt.get match {
              case (1, 2) =>
                val (vs, ve) = lp.lenDelim()
                txt = Some(new String(b, vs, ve - vs, "UTF-8"))
              case (_, w) => lp.skip(w)
            }
            lt = lp.tag()
          }
        case (2, 2) => // FloatList{1: repeated float, PACKED}
          val (ls, le) = p.lenDelim()
          val lp = new Pb(b, ls, le)
          val acc = scala.collection.mutable.ListBuffer.empty[Float]
          var lt = lp.tag()
          while (lt.nonEmpty) {
            lt.get match {
              case (1, 2) =>
                val (vs, ve) = lp.lenDelim()
                var i = vs
                while (i + 4 <= ve) {
                  acc += java.lang.Float.intBitsToFloat(
                    java.nio.ByteBuffer.wrap(b, i, 4)
                      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
                  i += 4
                }
              case (1, 5) =>
                acc += java.lang.Float.intBitsToFloat(
                  java.nio.ByteBuffer.wrap(b, lp.pos, 4)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
                lp.pos += 4
              case (_, w) => lp.skip(w)
            }
            lt = lp.tag()
          }
          floats = Some(acc.toSeq)
        case (3, 2) => // Int64List{1: repeated int64, PACKED}
          val (ls, le) = p.lenDelim()
          val lp = new Pb(b, ls, le)
          val acc = scala.collection.mutable.ListBuffer.empty[Long]
          var lt = lp.tag()
          while (lt.nonEmpty) {
            lt.get match {
              case (1, 2) =>
                val (vs, ve) = lp.lenDelim()
                val vp = new Pb(b, vs, ve)
                while (vp.pos < vp.end) acc += vp.varint()
              case (1, 0) => acc += lp.varint()
              case (_, w) => lp.skip(w)
            }
            lt = lp.tag()
          }
          ints = Some(acc.toSeq)
        case (_, w) => p.skip(w)
      }
      t = p.tag()
    }
    (txt, ints, floats)
  }

  // ---- writer / fixture side ----

  private def pbVarint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    var more = true
    while (more) {
      val b = (x & 0x7F).toInt
      x = x >>> 7
      more = x != 0
      out += (if (more) (b | 0x80) else b).toByte
    }
    out.toArray
  }
  private def pbLenDelim(field: Int, body: Array[Byte]): Array[Byte] =
    pbVarint((field << 3) | 2) ++ pbVarint(body.length) ++ body

  /** Serialize one tf.Example with text (bytes), int64 and float
    * features — the fixture generator for [[read]] and a valid export
    * for handing curated corpora to a TF input pipeline. */
  def exampleBytes(textFeatures: Seq[(String, String)],
                   intFeatures: Seq[(String, Seq[Long])] = Nil,
                   floatFeatures: Seq[(String, Seq[Float])] = Nil): Array[Byte] = {
    def entry(key: String, feature: Array[Byte]): Array[Byte] =
      pbLenDelim(1, pbLenDelim(1, key.getBytes("UTF-8")) ++
        pbLenDelim(2, feature))
    val entries =
      textFeatures.map { case (k, v) =>
        entry(k, pbLenDelim(1, pbLenDelim(1, v.getBytes("UTF-8"))))
      } ++
      intFeatures.map { case (k, vs) =>
        entry(k, pbLenDelim(3,
          pbLenDelim(1, vs.toArray.flatMap(pbVarint))))
      } ++
      floatFeatures.map { case (k, vs) =>
        val packed = vs.toArray.flatMap { f =>
          java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .putInt(java.lang.Float.floatToIntBits(f)).array()
        }
        entry(k, pbLenDelim(2, pbLenDelim(1, packed)))
      }
    pbLenDelim(1, entries.flatten.toArray) // Example{1: Features}
  }

  /** Validate that every column of `schema` maps onto a tf.Example
    * feature (strings → bytes, integrals/boolean → int64, floating →
    * float (f32), arrays of those likewise) — LOUD at statement/plan
    * time, before any executor runs. */
  def validateSchema(schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    schema.foreach { f => f.dataType match {
      case StringType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType => ()
      case ArrayType(IntegerType | LongType, _) => ()
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => throw new IllegalArgumentException(
        s"cannot map column '${f.name}' of type ${other.simpleString} " +
          "onto tf.Example features (strings, numbers, booleans and " +
          "arrays of numbers only)")
    }}
  }

  /** One Row → serialized tf.Example under a [[validateSchema]]-clean
    * schema. NULL columns become ABSENT features (the tf.Example
    * convention); doubles narrow to f32 — the format's only float
    * width. Shared by `COPY ... FORMAT tfrecord` and the streaming
    * sink. */
  def rowExampleBytes(schema: org.apache.spark.sql.types.StructType,
                      r: org.apache.spark.sql.Row): Array[Byte] = {
    import org.apache.spark.sql.types._
    var texts = List.empty[(String, String)]
    var ints = List.empty[(String, Seq[Long])]
    var floats = List.empty[(String, Seq[Float])]
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!r.isNullAt(i)) f.dataType match {
        case StringType  => texts ::= (f.name, r.getString(i))
        case IntegerType => ints ::= (f.name, Seq(r.getInt(i).toLong))
        case LongType    => ints ::= (f.name, Seq(r.getLong(i)))
        case BooleanType =>
          ints ::= (f.name, Seq(if (r.getBoolean(i)) 1L else 0L))
        case FloatType   => floats ::= (f.name, Seq(r.getFloat(i)))
        case DoubleType  => floats ::= (f.name, Seq(r.getDouble(i).toFloat))
        case ArrayType(LongType, _) => ints ::= (f.name, r.getSeq[Long](i))
        case ArrayType(IntegerType, _) =>
          ints ::= (f.name, r.getSeq[Int](i).map(_.toLong))
        case ArrayType(FloatType, _) => floats ::= (f.name, r.getSeq[Float](i))
        case ArrayType(DoubleType, _) =>
          floats ::= (f.name, r.getSeq[Double](i).map(_.toFloat))
        case _ => () // unreachable: validateSchema rejected it
      }
    }
    exampleBytes(texts.reverse, ints.reverse, floats.reverse)
  }

  /** Frame serialized Examples into ONE .tfrecord file's bytes (the
    * u64le length + masked CRC32C framing TF readers verify). */
  def tfRecordBytes(examples: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    examples.foreach { ex =>
      val lenBytes = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(ex.length.toLong).array()
      def crcLe(v: Int): Array[Byte] =
        java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      out.write(lenBytes)
      out.write(crcLe(maskedCrc(lenBytes, 0, 8)))
      out.write(ex)
      out.write(crcLe(maskedCrc(ex, 0, ex.length)))
    }
    out.toByteArray
  }
}
