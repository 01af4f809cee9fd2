package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** ZONE MAPS for the BlockFile format: a per-file `.zones` SIDECAR
  * holding each block's [min, max] for every numeric column, so a
  * filtered scan can SKIP whole blocks at planning time — the
  * block-granular analog of parquet row-group statistics, retrofitted
  * onto the reference's format without changing a single byte of it
  * (reference-written `.bin` files gain skipping by running [[write]]
  * over them; reference readers ignore the sidecar entirely).
  *
  * Correctness is guarded structurally, not by trust: the sidecar
  * records the byte length and the exact block-offset list of the file
  * it describes, and a reader that finds EITHER drifted (the file was
  * appended to, rewritten, or the sidecar belongs to an older
  * generation) ignores the sidecar and scans everything. Skipping is
  * therefore only ever an optimization — a stale or missing sidecar
  * degrades to the full scan, never to wrong rows. [[BlockFile.append]]
  * and the [[BlockFile.writeDir]] overwrite sweep additionally delete
  * sidecars they invalidate, so the guard is defense in depth.
  *
  * The scan keeps every pushed filter RESIDUAL (Spark re-evaluates rows
  * after the scan): zone maps prune which blocks are read, they never
  * decide row membership — so an inequality that only PARTIALLY covers
  * a block stays exact.
  */
object ZoneMap {

  private val Magic = "graft-zones v1"

  private[sources] def sidecar(binPath: String): String = binPath + ".zones"

  /** Numeric (skippable) fields of a BlockFile schema: the three
    * fixed-width types. Strings are not covered (their per-value length
    * bytes make a min/max walk cost as much as reading them). */
  private def covered(schema: StructType): Seq[(StructField, Int)] =
    schema.fields.toSeq.zipWithIndex.filter { case (f, _) =>
      f.dataType == IntegerType || f.dataType == FloatType ||
        f.dataType == TimestampType
    }

  /** Build (or rebuild) the sidecar(s) for `path` — a single `.bin`
    * file or a committed directory of parts (one sidecar per part).
    * One sequential pass per file, skipping string columns by their
    * size prefix. Works on reference-written files unchanged.
    *
    * The single-file form runs on the driver (a lone file has no
    * sub-file parallelism unit the sidecar could be built from without
    * a merge step); for a DIRECTORY use the `(spark, path)` overload,
    * which builds one sidecar per part IN TASKS — a large export's
    * stats pass must not stream every numeric byte through the
    * driver. */
  def write(path: String): Unit = {
    val f0 = new java.io.File(path)
    if (f0.isDirectory) {
      BlockFile.committedParts(f0).foreach(p => writeOne(p.getPath))
    } else writeOne(path)
  }

  /** Distributed sidecar build for a directory-of-blocks table: one
    * task per part (each part's pass is self-contained, like
    * [[BlockFile.writeDir]]'s per-task part writes — the path must be
    * executor-reachable, same contract). Single files delegate to the
    * driver-side form. */
  def write(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val f0 = new java.io.File(path)
    if (!f0.isDirectory) { writeOne(path); return }
    val parts = BlockFile.committedParts(f0).map(_.getAbsolutePath)
    spark.sparkContext.parallelize(parts, parts.length)
      .foreach(p => ZoneMap.writeOne(p))
  }

  private def writeOne(binPath: String): Unit = {
    val schema = BlockFile.readSchema(binPath)
    val cols = covered(schema)
    val starts = BlockFile.blockStarts(binPath)
    val f = new RandomAccessFile(binPath, "r")
    val lines = new scala.collection.mutable.ArrayBuffer[String]
    try {
      lines += Magic
      lines += s"len ${f.length()}"
      lines += "cols " + cols.map(_._1.name).mkString(",")
      starts.foreach { off =>
        f.seek(off)
        val rows = readU32(f)
        val ranges = new scala.collection.mutable.ArrayBuffer[(Double, Double)]
        val want = cols.map(_._2).toSet
        schema.fields.zipWithIndex.foreach { case (field, ci) =>
          val size = readU64(f)
          if (!want.contains(ci)) f.seek(f.getFilePointer + size)
          else {
            val body = new Array[Byte](size.toInt)
            f.readFully(body)
            val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            var mn = Double.PositiveInfinity
            var mx = Double.NegativeInfinity
            field.dataType match {
              case IntegerType =>
                var i = 0
                while (i < rows) {
                  val v = bb.getInt().toDouble
                  if (v < mn) mn = v; if (v > mx) mx = v; i += 1
                }
              case FloatType =>
                // Spark orders NaN ABOVE every number (and NaN = NaN is
                // true), so a NaN widens the max to +inf — any
                // greater-than filter then keeps the block, and a
                // finite-equality filter can still skip an all-NaN block
                var i = 0
                while (i < rows) {
                  val v = bb.getFloat()
                  if (java.lang.Float.isNaN(v)) mx = Double.PositiveInfinity
                  else {
                    val d = v.toDouble
                    if (d < mn) mn = d; if (d > mx) mx = d
                  }
                  i += 1
                }
              case TimestampType =>
                var i = 0
                while (i < rows) {
                  val v = bb.getLong().toDouble // µs < 2^53: exact
                  if (v < mn) mn = v; if (v > mx) mx = v; i += 1
                }
              case other => throw new IllegalStateException(other.toString)
            }
            ranges += ((mn, mx))
          }
        }
        lines += s"block $off " +
          ranges.map { case (a, b) => s"$a $b" }.mkString(" ")
      }
    } finally f.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(sidecar(binPath)),
      lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  /** Per-block column ranges for `binPath`, or None when the sidecar is
    * absent, malformed, or describes a different file state (length or
    * block-offset drift) — the caller then scans every block. */
  private[sources] def load(binPath: String,
      starts: Seq[Long]): Option[Map[Long, Map[String, (Double, Double)]]] =
    try {
      val p = java.nio.file.Paths.get(sidecar(binPath))
      if (!java.nio.file.Files.exists(p)) return None
      val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").toSeq
      if (lines.headOption.forall(_ != Magic)) return None
      if (lines(1) != s"len ${new java.io.File(binPath).length()}") return None
      val cols = lines(2).stripPrefix("cols ").split(",").toSeq
        .filter(_.nonEmpty)
      val blocks = lines.drop(3).filter(_.startsWith("block ")).map { l =>
        val parts = l.split(" ")
        val off = parts(1).toLong
        val ranges = cols.indices.map { i =>
          cols(i) -> ((parts(2 + 2 * i).toDouble, parts(3 + 2 * i).toDouble))
        }.toMap
        off -> ranges
      }.toMap
      // the sidecar must describe EXACTLY this footer's blocks
      if (blocks.keySet != starts.toSet) None else Some(blocks)
    } catch { case _: Exception => None }

  private def num(v: Any): Option[Double] = v match {
    case i: Int                  => Some(i.toDouble)
    case l: Long                 => Some(l.toDouble)
    // a NaN comparison value is unusable for range logic (Spark's NaN
    // equals NaN and sorts above +inf) — conservative keep
    case f: Float                => if (f.isNaN) None else Some(f.toDouble)
    case d: Double               => if (d.isNaN) None else Some(d)
    case t: java.sql.Timestamp   =>
      Some((t.getTime * 1000L + (t.getNanos % 1000000) / 1000L).toDouble)
    case t: java.time.Instant    =>
      Some((t.getEpochSecond * 1000000L + t.getNano / 1000L).toDouble)
    case _                       => None
  }

  /** Can this filter ever skip a block? (shape check at push time —
    * column coverage is re-checked per file at planning). */
  private[sources] def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => num(v).isDefined
    case GreaterThan(_, v)        => num(v).isDefined
    case GreaterThanOrEqual(_, v) => num(v).isDefined
    case LessThan(_, v)           => num(v).isDefined
    case LessThanOrEqual(_, v)    => num(v).isDefined
    case In(_, vs)                => vs.nonEmpty && vs.forall(num(_).isDefined)
    case _                        => false
  }

  /** May the block with `ranges` contain a row matching ALL `filters`?
    * A filter whose column is not covered is ignored (conservative). */
  private[sources] def mayMatch(ranges: Map[String, (Double, Double)],
                                filters: Seq[Filter]): Boolean =
    filters.forall {
      case EqualTo(c, v) => check(ranges, c, v) { case ((mn, mx), x) =>
        x >= mn && x <= mx }
      case GreaterThan(c, v) => check(ranges, c, v) { case ((_, mx), x) =>
        mx > x }
      case GreaterThanOrEqual(c, v) => check(ranges, c, v) { case ((_, mx), x) =>
        mx >= x }
      case LessThan(c, v) => check(ranges, c, v) { case ((mn, _), x) =>
        mn < x }
      case LessThanOrEqual(c, v) => check(ranges, c, v) { case ((mn, _), x) =>
        mn <= x }
      case In(c, vs) => ranges.get(c) match {
        case None => true
        case Some((mn, mx)) =>
          vs.exists(v => num(v).forall(x => x >= mn && x <= mx))
      }
      case _ => true
    }

  private def check(ranges: Map[String, (Double, Double)], col: String,
                    v: Any)(p: (((Double, Double), Double)) => Boolean): Boolean =
    (ranges.get(col), num(v)) match {
      case (Some(r), Some(x)) => p((r, x))
      case _                  => true
    }

  private def readU32(f: RandomAccessFile): Int = {
    val b = new Array[Byte](4); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }
  private def readU64(f: RandomAccessFile): Long = {
    val b = new Array[Byte](8); f.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }
}
