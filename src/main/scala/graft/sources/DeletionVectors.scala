package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** DELETION VECTORS — merge-on-read DELETE for [[Versioned]] datasets
  * (the Delta/Iceberg v2 positional-delete model): instead of
  * rewriting a segment to drop a few rows, a VECTORED delete writes a
  * tiny sidecar of deleted row POSITIONS (the same parquet
  * `_metadata.file_path`/`row_index` identity the copy-on-write DML
  * already keys on) and the version's manifest maps segments to their
  * vectors. Reads anti-join the vector positions away; OPTIMIZE (and
  * any rewrite touching the segment) MATERIALIZES them — fresh
  * segments never carry vectors. At 100 TB this is the difference
  * between a takedown of 100 documents costing 100 segment rewrites
  * (~100 GB of writes) and costing ~100 KB of position lists.
  *
  * File format (`dv/<seg>-<uuid>.dv`, written once, immutable like
  * segments): magic line, total deleted count, then per part file its
  * name and sorted positions. Vectors are per-SEGMENT (positions keyed
  * by part-file name, which is unique within a segment's directory).
  *
  * The read-side application is an ANTI JOIN on (file, position) —
  * exactly how Iceberg's Spark reader applies positional deletes: no
  * UDFs, no custom physical operators, broadcast when the vector is
  * small, a plain shuffled anti join when a pathological vector is
  * not. Row-group/segment SKIPPING stays correct unmodified: deletes
  * only remove rows, so every stats bound remains a valid
  * over-approximation.
  */
object DeletionVectors {

  private val Magic = "graft-dv v1"

  /** Serialize and publish a segment's deletion vector (tmp + rename,
    * task-safe): `positions` maps part-file NAME → sorted deleted
    * `row_index` values. Returns the vector's file name under `dv/`. */
  private[sources] def write(conf: Configuration, path: String, seg: String,
                             positions: Map[String, Array[Long]]): String = {
    val fs = new Path(path).getFileSystem(conf)
    val dir = new Path(s"$path/dv")
    fs.mkdirs(dir)
    val name = s"$seg-${java.util.UUID.randomUUID().toString.take(8)}.dv"
    val tmp = new Path(dir, s".tmp-$name")
    val out = new DataOutputStream(fs.create(tmp, true))
    try {
      out.writeUTF(Magic)
      out.writeLong(positions.valuesIterator.map(_.length.toLong).sum)
      out.writeInt(positions.size)
      positions.toSeq.sortBy(_._1).foreach { case (f, ps) =>
        out.writeUTF(f)
        out.writeInt(ps.length)
        ps.foreach(out.writeLong)
      }
    } finally out.close()
    require(fs.rename(tmp, new Path(dir, name)),
      s"could not publish deletion vector $name at $path")
    name
  }

  private[sources] def read(conf: Configuration, path: String,
                            dvName: String): Map[String, Array[Long]] = {
    val fs = new Path(path).getFileSystem(conf)
    val in = new DataInputStream(fs.open(new Path(s"$path/dv", dvName)))
    try {
      require(in.readUTF() == Magic, s"not a deletion vector: $dvName")
      in.readLong() // total
      val nFiles = in.readInt()
      (0 until nFiles).map { _ =>
        val f = in.readUTF()
        val n = in.readInt()
        f -> Array.fill(n)(in.readLong())
      }.toMap
    } finally in.close()
  }

  /** Total deleted rows in a vector — header-only read, what the
    * metadata row counts subtract. */
  private[sources] def count(conf: Configuration, path: String,
                             dvName: String): Long = {
    val fs = new Path(path).getFileSystem(conf)
    val in = new DataInputStream(fs.open(new Path(s"$path/dv", dvName)))
    try {
      require(in.readUTF() == Magic, s"not a deletion vector: $dvName")
      in.readLong()
    } finally in.close()
  }

  /** The deleted-position set of a snapshot as a two-column frame
    * `(__dvkey = "<seg>/<fileName>", __dvpos)` — vectors parse in
    * TASKS (one per vector), so a wide manifest's vectors never stream
    * through the driver. */
  private[sources] def positionsDf(spark: SparkSession, path: String,
                                   dvMap: Map[String, String]): DataFrame = {
    val entries = dvMap.toSeq
    val rows = spark.sparkContext
      .parallelize(entries, math.min(math.max(entries.size, 1), 64))
      .flatMap { case (seg, dvName) =>
        read(new Configuration(), path, dvName).iterator.flatMap {
          case (file, ps) => ps.iterator.map(p => (s"$seg/$file", p))
        }
      }
    spark.createDataFrame(rows).toDF("__dvkey", "__dvpos")
  }

  /** Apply a snapshot's vectors to a provenance-tagged frame (must
    * carry `__file`/`__pos`/`__seg`): anti-join the deleted positions
    * away. Broadcast when the vectors are small (their on-disk size is
    * known from the manifest listing — 8 bytes a row, so the usual
    * takedown-sized vector broadcasts); a huge vector degrades to a
    * shuffled anti join rather than a driver OOM. */
  private[sources] def applyTo(tagged: DataFrame, spark: SparkSession,
                               path: String,
                               dvMap: Map[String, String]): DataFrame = {
    if (dvMap.isEmpty) return tagged
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dvBytes = dvMap.valuesIterator.map { n =>
      fs.getFileStatus(new Path(s"$path/dv", n)).getLen
    }.sum
    val dv0 = positionsDf(spark, path, dvMap)
    val dv = if (dvBytes <= 32L * 1024 * 1024) F.broadcast(dv0) else dv0
    tagged
      .withColumn("__dvkey", F.concat(F.col("__seg"), F.lit("/"),
        F.element_at(F.split(F.col("__file"), "/"), -1)))
      .withColumn("__dvpos", F.col("__pos"))
      .join(dv, Seq("__dvkey", "__dvpos"), "left_anti")
      .drop("__dvkey", "__dvpos")
  }
}
