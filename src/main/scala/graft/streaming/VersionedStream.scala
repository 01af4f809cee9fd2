package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.Versioned

/** STREAMING READS of a [[graft.sources.Versioned]] dataset — the
  * lakehouse table-as-a-stream direction ([[Streams.versionedSink]] is
  * the write side; this closes the loop, the way a table format's
  * streaming source tails its transaction log):
  *
  * {{{
  *   spark.readStream
  *     .format("graft-versioned")          // or classOf[...].getName
  *     .option("path", "/corpora/docs_ds")
  *     .option("startingVersion", "0")     // default 0 = everything
  *     .load()
  * }}}
  *
  * OFFSETS ARE MANIFEST VERSIONS. Each micro-batch covers a committed
  * version range `(from, to]` and its rows are exactly
  * [[Versioned.changes]] over that range — the segments ADDED by those
  * commits, resolved through manifests only (never a directory listing
  * of `data/`, so a crashed commit's orphan segment is invisible and a
  * segment file is only ever read AFTER its manifest rename made it
  * atomic — the reason a plain file stream over `data/` would be
  * wrong). Appends stream their new rows; a compaction/z-order
  * republish streams its whole snapshot (the reprocess-after-rewrite
  * contract consumers need); a pruned DML streams its REWRITTEN
  * segments' survivor rows. This is the ADD side of the CDC pair, like
  * every table-format streaming source: retractions are segment-level
  * and polled separately via [[Versioned.removedSegments]] /
  * [[Versioned.removals]].
  *
  * Exactly-once: offsets live in the stream's checkpoint; restart
  * resumes from the last committed version cursor. Time travel rules
  * apply — the cursor's manifest must not be vacuumed mid-stream
  * (loud failure otherwise, never silent skips).
  *
  * The schema is pinned at source creation (a stream cannot widen
  * mid-run); segments from before a widening append serve NULL for the
  * newer columns, and rows committed after one are PROJECTED onto the
  * pinned schema — restart the stream to pick up evolved columns.
  *
  * At 100 TB: `getOffset` is one manifest-directory listing;
  * `getBatch` reads only the delta segments — the incremental
  * consumer's cost tracks the commit volume, never the table size. */
class VersionedStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-versioned"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned source needs .option(\"path\", <dataset dir>)"))

  private def readsChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-versioned source infers its schema from the dataset head; " +
        "do not pass one")
    val base = Versioned.read(
      sqlContext.sparkSession, pathOf(parameters)).schema
    // readChangeFeed mode streams the ROW-LEVEL change data feed:
    // table columns + _change_type + _commit_version per micro-batch
    val out =
      if (!readsChangeFeed(parameters)) base
      else StructType(base.fields.toSeq :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false) :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false))
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    // startingTimestamp (epoch ms or the FOR TIMESTAMP AS OF instant
    // resolution): stream from the version that was HEAD at that
    // wall-clock moment — mutually exclusive with startingVersion
    val startV = (parameters.get("startingVersion"),
        parameters.get("startingTimestamp")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "graft-versioned: startingVersion and startingTimestamp are " +
          "mutually exclusive")
      case (Some(v), None) => v.toLong
      case (None, Some(ts)) =>
        graft.sources.Versioned.versionAt(
          sqlContext.sparkSession, path, ts.toLong)
      case (None, None) => 0L
    }
    new VersionedStreamSource(sqlContext, path, startV,
      changeFeed = readsChangeFeed(parameters))
  }
}

class VersionedStreamSource(sqlContext: SQLContext, path: String,
                            startingVersion: Long,
                            changeFeed: Boolean = false) extends Source {
  private val spark = sqlContext.sparkSession

  private val tableSchema: StructType = Versioned.read(spark, path).schema

  override val schema: StructType =
    if (!changeFeed) tableSchema
    else StructType(tableSchema.fields.toSeq :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false))

  /** Offsets arrive live (LongOffset) or replayed from the checkpoint
    * log (SerializedOffset carrying LongOffset's json — the bare
    * version number). */
  private def versionOf(o: Offset): Long = o match {
    case lo: LongOffset => lo.offset
    case so: SerializedOffset => so.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val vs = Versioned.versions(spark, path)
    vs.lastOption.map(LongOffset(_))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    // changeFeed mode tails the ROW-LEVEL feed — inserts, update
    // pre/postimage pairs, deletes, with commit attribution — the
    // CDC-replication input (apply to a downstream table via MERGE).
    // A range crossing a version whose row delta is unknowable (a
    // legacy rewrite, a restore) fails LOUDLY, never skips silently.
    val adds =
      if (changeFeed) Versioned.changeFeed(spark, path, from, Some(to))
      else Versioned.changes(spark, path, from, Some(to))
    val have = adds.columns.toSet
    // project onto the PINNED schema: evolved trailing columns from
    // commits after source creation drop; pre-widening segments serve
    // explicit NULLs (the readSegmentsAligned discipline)
    val aligned = adds.select(schema.fields.map { f =>
      if (have(f.name)) F.col(f.name).cast(f.dataType).as(f.name)
      else F.lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    org.apache.spark.sql.graft.StreamingShim.asStreaming(aligned)
  }

  override def stop(): Unit = ()
}
