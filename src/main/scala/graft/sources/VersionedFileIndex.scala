package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over one committed [[Versioned]] snapshot that
  * performs MANIFEST-LEVEL DATA SKIPPING: Catalyst hands `listFiles`
  * the pushed-down data filters at planning time, and segments whose
  * [[SegmentStats]] sidecars prove the filters unsatisfiable are
  * dropped BEFORE Spark opens a single footer — the architecture
  * Delta Lake's TahoeFileIndex / Iceberg's manifest evaluator use,
  * expressed on the engine's own snapshot layout. Everything
  * downstream is the stock parquet V1 read path: pushed filters still
  * prune row groups inside surviving files, whole-stage codegen is
  * unaffected, and `_metadata` provenance columns keep working (the
  * DML detection passes depend on them — so a selective DELETE's
  * detection scan now skips non-overlapping segments entirely).
  *
  * Every file of every segment is listed ONCE at construction (the
  * same driver-side listing `spark.read.parquet(segDirs)` would do);
  * `listFiles` itself is pure in-memory evaluation per query. A
  * segment without a sidecar is always read — stats are an
  * optimization, never a correctness gate.
  */
private[graft] final class VersionedFileIndex(
    spark: SparkSession,
    root: String,
    segs: Seq[String],
    filesBySeg: Map[String, Array[FileStatus]],
    statsBySeg: Map[String, Option[SegmentStats.SegStats]],
    val dataSchema: StructType)
  extends FileIndex {

  /** Accounting for the LAST `listFiles` call that carried data
    * filters — observability for specs and the bench's prune probes
    * (the manifest-skipping analog of the row-group `groups_read`
    * fields). PER-OPEN since round 18: the snapshot index cache hands
    * every open its own [[fork]] over the shared immutable listing
    * data, so two queries planned concurrently over one snapshot can
    * no longer overwrite each other's counts (round-17's shared
    * instance made read-after-query racy under parallel planners).
    * `@volatile` still matters within one open: Spark may evaluate
    * `listFiles` on an AQE stage-materialization thread while the
    * consumer reads from the caller thread. */
  @volatile var lastSegmentsTotal: Int = segs.length
  @volatile var lastSegmentsRead: Int = segs.length

  /** A new index over the SAME immutable listing/stats/schema data
    * with fresh accounting fields — what the snapshot cache returns on
    * a hit, so the expensive driver/distributed listing is shared but
    * observability is per-open. */
  private[graft] def fork(): VersionedFileIndex =
    new VersionedFileIndex(spark, root, segs, filesBySeg, statsBySeg,
      dataSchema)

  /** Whether the owning session has stopped — the cache's eviction
    * probe (a cached index strongly holds its session). */
  private[graft] def sessionStopped: Boolean =
    try spark.sparkContext.isStopped
    catch { case _: Throwable => true }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // normalize ONCE (reference-backed constants → literals), then
    // evaluate per segment
    val filters = dataFilters.map(SegmentStats.normalize)
    val kept =
      if (filters.isEmpty) segs
      else segs.filter { s =>
        statsBySeg.getOrElse(s, None) match {
          case Some(st) => filters.forall(SegmentStats.mayMatch(st, _))
          case None => true
        }
      }
    if (dataFilters.nonEmpty) {
      lastSegmentsTotal = segs.length
      lastSegmentsRead = kept.length
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.iterator.flatMap(filesBySeg(_)).toArray))
  }

  /** Planning-only evaluation: how many segments could satisfy ALL of
    * `filters` per their sidecars — the number [[listFiles]] would
    * keep, without listing a file. */
  def pruneCount(filters: Seq[Expression]): Int =
    if (filters.isEmpty) segs.length
    else {
      val fs = filters.map(SegmentStats.normalize)
      segs.count { s =>
        statsBySeg.getOrElse(s, None) match {
          case Some(st) => fs.forall(SegmentStats.mayMatch(st, _))
          case None => true
        }
      }
    }

  override def inputFiles: Array[String] =
    segs.iterator.flatMap(filesBySeg(_)).map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    segs.iterator.flatMap(filesBySeg(_)).map(_.getLen).sum

  override def partitionSchema: StructType = new StructType()
}

private[graft] object VersionedFileIndex {

  /** Manifests at or under this many segments open with serial driver
    * listings (a handful of round trips beats a Spark job); larger
    * manifests run ONE distributed job that both lists every segment
    * dir and reads every stats sidecar — driver filesystem cost O(1)
    * in manifest length. Without it every `Versioned.read` of a
    * 100k-segment dataset paid ~200k SERIAL driver round trips
    * (listStatus + sidecar read per segment) before planning began —
    * the same hazard class `footerRowCount`/`readManifestsBulk`
    * already fixed on their paths. */
  private val DistributedOpenCutoff = 32

  /** PER-SEGMENT listing cache (round 18): a committed segment dir is
    * IMMUTABLE (UUID-named, never rewritten; appends/DML create new
    * segments), so its file listing and stats sidecar can be reused
    * across SNAPSHOTS — without this, every new version re-listed the
    * whole manifest even though it shares all but ~one segment with
    * its predecessor (the CDC apply paid two 64-task listing jobs per
    * statement: source head + replica head, each one version newer
    * than the last). Incremental evolution now lists only the delta —
    * the Delta-Lake-incremental-file-index behavior, and the property
    * that makes a frequent-small-commit 100k-segment dataset plannable
    * at all. The ONE in-place sidecar mutation (ANALYZE backfill)
    * invalidates via [[invalidateSegments]], same hook as the snapshot
    * index cache. Bounded LRU; entries are (files, stats) — KB-scale
    * metadata, session-independent. */
  private val SegCacheMax = 8192
  private val segCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String),
        (Array[FileStatus], Option[SegmentStats.SegStats])](
        256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String),
            (Array[FileStatus], Option[SegmentStats.SegStats])])
          : Boolean = size() > SegCacheMax
    })

  /** Drop every cached segment listing under `path` — for ANALYZE,
    * which backfills stats sidecars in place. */
  private[graft] def invalidateSegments(path: String): Unit =
    segCache.synchronized {
      val it = segCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == path) it.remove()
    }

  /** Build the index for a snapshot: list each segment's parquet part
    * files, load sidecars, and resolve the snapshot schema — from
    * sidecar-recorded schemas alone when every segment has one (zero
    * footer I/O), falling back to a parquet `mergeSchema` inference
    * over only the sidecar-less segments otherwise. Schemas fold in
    * manifest order with first-wins columns, mirroring the append
    * contract (shared prefix fixed, evolution appends trailing
    * columns). */
  def open(spark: SparkSession, path: String,
           segs: Seq[String]): VersionedFileIndex = {
    val cached = segCache.synchronized {
      segs.flatMap(s =>
        Option(segCache.get((path, s))).map(s -> _)).toMap
    }
    val missing = segs.filterNot(cached.contains)
    val (filesNew, statsNew) =
      if (missing.isEmpty)
        (Map.empty[String, Array[FileStatus]],
          Map.empty[String, Option[SegmentStats.SegStats]])
      else if (missing.length <= DistributedOpenCutoff) {
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        (missing.map { s =>
          s -> fs.listStatus(new Path(s"$path/data/$s"))
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        }.toMap,
          missing.map(s => s -> SegmentStats.read(spark, path, s)).toMap)
      } else distributedOpen(spark, path, missing)
    segCache.synchronized {
      missing.foreach(s =>
        segCache.put((path, s), (filesNew(s), statsNew(s))))
    }
    val files: Map[String, Array[FileStatus]] =
      segs.map(s => s -> cached.get(s).map(_._1).getOrElse(filesNew(s)))
        .toMap
    val stats: Map[String, Option[SegmentStats.SegStats]] =
      segs.map(s => s -> cached.get(s).map(_._2).getOrElse(statsNew(s)))
        .toMap
    val bare = segs.filter(stats(_).isEmpty)
    val fromSidecars = segs.flatMap(s => stats(s).map(_.schema))
    val inferred: Seq[StructType] =
      if (bare.isEmpty) Seq.empty
      else if (bare.forall(files(_).isEmpty)) Seq.empty
      else Seq(spark.read.option("mergeSchema", "true")
        .parquet(bare.map(s => s"$path/data/$s"): _*).schema)
    val schema = fold(fromSidecars ++ inferred)
    require(schema.nonEmpty, s"no resolvable schema at $path " +
      s"(segments: ${segs.mkString(", ")})")
    new VersionedFileIndex(spark, path, segs, files, stats, schema)
  }

  /** The >cutoff half of [[open]]: one task per segment lists the dir
    * and reads the sidecar TEXT (both KB-scale metadata); the driver
    * rebuilds plain [[FileStatus]]es from (path, length, mtime) —
    * sidestepping Hadoop-version serializability questions — and
    * parses sidecars in memory. Block locality hints are dropped for
    * these manifests (object stores have none, and a 100k-segment
    * local-disk deployment does not exist). */
  private def distributedOpen(spark: SparkSession, path: String,
      segs: Seq[String])
      : (Map[String, Array[FileStatus]],
         Map[String, Option[SegmentStats.SegStats]]) = {
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = spark.sparkContext
      .parallelize(segs, math.min(segs.length, 64))
      .map { s =>
        val conf = confBc.value.value
        val fs = new Path(path).getFileSystem(conf)
        val fls = fs.listStatus(new Path(s"$path/data/$s"))
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(st => (st.getPath.toString, st.getLen,
            st.getModificationTime))
        val sc = SegmentStats.sidecar(path, s)
        val txt: Option[String] =
          try {
            if (!fs.exists(sc)) None
            else {
              val in = fs.open(sc)
              try Some(new String(
                org.apache.commons.io.IOUtils.toByteArray(in),
                java.nio.charset.StandardCharsets.UTF_8))
              finally in.close()
            }
          } catch { case _: java.io.IOException => None }
        (s, fls, txt)
      }.collect()
    (rows.iterator.map { case (s, fls, _) =>
      s -> fls.map { case (p, len, mt) =>
        new FileStatus(len, false, 1, 134217728L, mt, new Path(p))
      }
    }.toMap,
      rows.iterator.map { case (s, _, txt) =>
        s -> txt.flatMap(SegmentStats.parse)
      }.toMap)
  }

  /** First-wins-by-name column fold; all fields nullable (a segment
    * written before a widening append serves NULL for the newer
    * columns). A same-name type conflict is loud — the append contract
    * forbids retypes, so a conflict means external tampering. */
  private def fold(ss: Seq[StructType]): StructType = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.StructField]
    ss.foreach(_.fields.foreach { f =>
      out.get(f.name) match {
        case None => out(f.name) = f.copy(nullable = true)
        case Some(prev) =>
          require(prev.dataType == f.dataType,
            s"conflicting types for column '${f.name}': " +
              s"${prev.dataType.simpleString} vs ${f.dataType.simpleString}")
      }
    })
    StructType(out.values.toSeq)
  }
}
