package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.sources.Versioned

/** Merge-on-read DELETE via deletion vectors: vectors apply on read,
  * union across statements, carry through appends and unrelated DML,
  * and materialize on any rewrite (COW DML, compact, OPTIMIZE). */
class DeletionVectorSpec extends SparkSpec {

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-dv-$tag").toString + "/ds"

  /** Three segments of 100 rows each: segment i holds ids
    * [100i, 100i+100). */
  private def ds(tag: String): String = {
    import spark.implicits._
    val path = freshPath(tag)
    (0 until 3).foreach { i =>
      Versioned.commit(
        (100 * i until 100 * (i + 1)).map(id => (id.toLong, s"p$id"))
          .toDF("id", "payload"), path)
    }
    path
  }

  /** md5 of every data byte of every part file of every segment —
    * the byte-identity witness that a vectored delete moved NO data. */
  private def dataFingerprint(path: String): Map[String, String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Versioned.headSegments(spark, path).flatMap { seg =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/data/$seg"))
        .filter(_.isFile).map { st =>
          val in = fs.open(st.getPath)
          val bytes =
            try org.apache.commons.io.IOUtils.toByteArray(in)
            finally in.close()
          s"$seg/${st.getPath.getName}" ->
            java.security.MessageDigest.getInstance("MD5").digest(bytes)
              .map("%02x".format(_)).mkString
        }
    }.toMap
  }

  test("vectored delete: zero data movement, reads and counts exact") {
    val path = ds("basic")
    val before = dataFingerprint(path)
    val v = Versioned.deleteWhereVectored(spark, path,
      F.col("id").isin(5L, 150L, 250L, 251L))
    assert(dataFingerprint(path) == before) // every byte identical
    assert(Versioned.headSegments(spark, path).size == 3)
    val df = Versioned.read(spark, path)
    assert(df.count() == 296L)
    assert(df.where(F.col("id").isin(5L, 150L, 250L)).count() == 0L)
    assert(Versioned.rowCount(spark, path) == 296L)
    // time travel: the pre-delete snapshot still serves the rows
    assert(Versioned.read(spark, path, Some(v - 1)).count() == 300L)
    // vectors union across statements
    Versioned.deleteWhereVectored(spark, path, F.col("id") === 6L)
    assert(Versioned.read(spark, path).count() == 295L)
    assert(Versioned.read(spark, path)
      .where(F.col("id").isin(5L, 6L)).count() == 0L)
    // a re-run of the same predicate matches nothing (no double count)
    Versioned.deleteWhereVectored(spark, path, F.col("id") === 6L)
    assert(Versioned.rowCount(spark, path) == 295L)
  }

  test("provenance reads and COW DML compose with vectors") {
    val path = ds("compose")
    Versioned.deleteWhereVectored(spark, path, F.col("id") === 110L)
    // detection-grade provenance read excludes the vectored row
    assert(Versioned.readWithProvenance(spark, path)
      .where(F.col("id") === 110L).count() == 0L)
    // a COW delete in another segment carries the vectored one intact
    val before = Versioned.headSegments(spark, path).toSet
    Versioned.deleteWhere(spark, path, F.col("id") === 205L)
    val after = Versioned.headSegments(spark, path).toSet
    assert(before.intersect(after).size == 2)
    val df = Versioned.read(spark, path)
    assert(df.count() == 298L)
    assert(df.where(F.col("id").isin(110L, 205L)).count() == 0L)
    // a COW rewrite of the VECTORED segment materializes its vector:
    // the new segment must not resurrect the deleted row
    Versioned.deleteWhere(spark, path, F.col("id") === 111L)
    val dfm = Versioned.read(spark, path)
    assert(dfm.count() == 297L)
    assert(dfm.where(F.col("id") === 110L).count() == 0L)
    // and the materialized segment no longer needs a vector
    val hv = Versioned.versions(spark, path).last
    assert(!Versioned.readDvMap(spark, path, hv).keySet
      .exists(s => !after.contains(s) || !before.contains(s)))
  }

  test("appends carry vectors; compact materializes them") {
    import spark.implicits._
    val path = ds("compact")
    Versioned.deleteWhereVectored(spark, path,
      F.col("id").between(0L, 49L))
    Versioned.commit(Seq((900L, "p900")).toDF("id", "payload"), path)
    assert(Versioned.read(spark, path).count() == 251L)
    // fold everything into one segment: vectors must materialize
    Versioned.compact(spark, path, targetBytes = Long.MaxValue)
    val hv = Versioned.versions(spark, path).last
    assert(Versioned.readDvMap(spark, path, hv).isEmpty)
    val df = Versioned.read(spark, path)
    assert(df.count() == 251L)
    assert(df.where(F.col("id") < 50L).count() == 0L)
  }

  test("metadata aggregates: COUNT stays exact, column stats bail") {
    val path = ds("meta")
    Versioned.deleteWhereVectored(spark, path, F.col("id") === 299L)
    val eng = Engine(spark, Files.createTempDirectory("graft-dv-b").toString)
    val out = eng.sql(s"SELECT COUNT() AS n FROM '$path'").df.collect()
    assert(out.head.getLong(0) == 299L)
    // MAX(id) = 299 was just vectored away — the stats must NOT serve
    // the stale footer bound
    val mx = eng.sql(s"SELECT MAX(id) AS mx FROM '$path'").df.collect()
    assert(mx.head.getLong(0) == 298L)
  }

  test("SQL surface: DELETE VECTORED FROM, status row, vacuum sweep") {
    val path = ds("sql")
    val eng = Engine(spark, Files.createTempDirectory("graft-dv-b").toString)
    val st = eng.sql(
      s"DELETE VECTORED FROM '$path' WHERE id % 100 = 7").df.collect().head
    assert(st.getLong(1) == 297L) // n_rows after
    assert(eng.sql(s"SELECT COUNT() AS n FROM '$path' WHERE id % 100 = 7")
      .df.collect().head.getLong(0) == 0L)
    // supersede the vectors with a second statement, then vacuum: the
    // superseded .dv files retire, the referenced ones survive
    eng.sql(s"DELETE VECTORED FROM '$path' WHERE id % 100 = 8")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvsBefore = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/dv"))
      .count(_.getPath.getName.endsWith(".dv"))
    assert(dvsBefore == 6) // 3 segments x 2 statements
    Versioned.vacuum(spark, path, keepVersions = 1)
    val dvsAfter = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/dv"))
      .count(_.getPath.getName.endsWith(".dv"))
    assert(dvsAfter == 3) // only the head's unioned vectors remain
    val df = Versioned.read(spark, path)
    assert(df.count() == 294L)
    assert(df.where(F.col("id") % 100 === 8).count() == 0L)
  }

  test("vectored UPDATE: positions vectored, replacements appended") {
    val path = ds("upd")
    val before = dataFingerprint(path)
    val eng = Engine(spark, Files.createTempDirectory("graft-dv-b").toString)
    val st = eng.sql(s"UPDATE VECTORED '$path' SET payload = 'X' " +
      "WHERE id % 100 = 7").df.collect().head
    assert(st.getLong(1) == 3L) // n_updated
    // every pre-existing byte identical; one appended segment
    val after = dataFingerprint(path)
    assert(before.toSet.subsetOf(after.toSet))
    assert(Versioned.headSegments(spark, path).size == 4)
    val df = Versioned.read(spark, path)
    assert(df.count() == 300L)
    assert(df.where(F.col("payload") === "X").count() == 3L)
    assert(df.where(F.col("id") === 7L).select("payload")
      .collect().head.getString(0) == "X")
    // a second vectored update reaches the REPLACEMENT rows (they are
    // ordinary provenance-tagged rows in the appended segment)
    eng.sql(s"UPDATE VECTORED '$path' SET payload = 'Y' " +
      "WHERE payload = 'X'")
    val df2 = Versioned.read(spark, path)
    assert(df2.count() == 300L)
    assert(df2.where(F.col("payload") === "Y").count() == 3L)
    assert(df2.where(F.col("payload") === "X").count() == 0L)
    // no-match: carry-all commit, nothing updated
    val st2 = eng.sql(s"UPDATE VECTORED '$path' SET payload = 'Z' " +
      "WHERE id = -1").df.collect().head
    assert(st2.getLong(1) == 0L)
    assert(Versioned.read(spark, path).count() == 300L)
  }

  test("skipping stays conservative over vectored segments") {
    val path = ds("skip")
    // vector away segment 1 entirely: bounds become stale supersets —
    // reads stay correct, skipping still prunes what it can prove
    Versioned.deleteWhereVectored(spark, path,
      F.col("id").between(100L, 199L))
    val (total, kept) = Versioned.pruneCount(spark, path,
      F.col("id").between(120L, 130L))
    assert((total, kept) == ((3, 1))) // stats still isolate segment 1
    assert(Versioned.read(spark, path)
      .where(F.col("id").between(120L, 130L)).count() == 0L)
  }
}
