package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.sources.Versioned

/** Row-level CHANGE DATA FEED: DML statements record their change rows
  * at commit (cost ∝ matched rows), pure appends synthesize `insert`
  * rows lazily from the segment delta, reorganizations are explicit
  * no-ops, and unknowable legacy deltas reject loudly. */
class ChangeFeedSpec extends SparkSpec {

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-cdf-$tag").toString + "/ds"

  /** Two segments of 100 rows each: segment i holds ids
    * [100i, 100i+100); payload = "p<id>", score = id * 2. */
  private def ds(tag: String): String = {
    import spark.implicits._
    val path = freshPath(tag)
    (0 until 2).foreach { i =>
      Versioned.commit(
        (100 * i until 100 * (i + 1))
          .map(id => (id.toLong, s"p$id", id.toLong * 2))
          .toDF("id", "payload", "score"), path)
    }
    path
  }

  private def feed(path: String, from: Long,
                   to: Option[Long] = None) =
    Versioned.changeFeed(spark, path, from, to)

  /** md5 of every data byte of every part file of every segment — the
    * byte-identity witness for carried segments. */
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

  test("appends synthesize insert rows; ranges slice by version") {
    val path = ds("append")
    val all = feed(path, 0L)
    assert(all.count() == 200L)
    assert(all.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet == Set("insert"))
    // version attribution: segment 2's rows carry _commit_version 2
    assert(feed(path, 1L).count() == 100L)
    assert(feed(path, 1L).agg(F.min("id"), F.max("_commit_version"))
      .collect().head match { case r => r.getLong(0) == 100L && r.getLong(1) == 2L })
    assert(feed(path, 2L).count() == 0L)
  }

  test("COW delete records delete rows") {
    val path = ds("cowdel")
    Versioned.deleteWhere(spark, path, F.col("id") % 50 === 7)
    val f = feed(path, 2L)
    val rows = f.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("_change_type") == "delete"))
    assert(rows.forall(_.getAs[Long]("_commit_version") == 3L))
    assert(rows.map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(7L, 57L, 107L, 157L))
    // no-match DML contributes nothing
    Versioned.deleteWhere(spark, path, F.col("id") === -1L)
    assert(feed(path, 3L).count() == 0L)
  }

  test("vectored delete records the same delete rows") {
    val path = ds("dvdel")
    Versioned.deleteWhereVectored(spark, path, F.col("id") % 50 === 7)
    val f = feed(path, 2L).collect()
    assert(f.length == 4)
    assert(f.forall(_.getAs[String]("_change_type") == "delete"))
    assert(f.map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(7L, 57L, 107L, 157L))
  }

  test("COW and vectored UPDATE record preimage/postimage pairs") {
    val path = ds("upd")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-b").toString)
    eng.sql(s"UPDATE '$path' SET score = score + 1000 WHERE id % 100 = 3")
    val f = feed(path, 2L)
    val byType = f.groupBy("_change_type").agg(F.count(F.lit(1)).as("n"),
        F.sum("score").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byType("update_preimage") == ((2L, (3L + 103L) * 2)))
    assert(byType("update_postimage") == ((2L, (3L + 103L) * 2 + 2000L)))
    // vectored variant emits the identical logical pairs
    eng.sql(s"UPDATE VECTORED '$path' SET score = score + 1000 " +
      "WHERE id % 100 = 4")
    val f2 = feed(path, 3L)
    val byType2 = f2.groupBy("_change_type").agg(F.count(F.lit(1)).as("n"),
        F.sum("score").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byType2("update_preimage") == ((2L, (4L + 104L) * 2)))
    assert(byType2("update_postimage") == ((2L, (4L + 104L) * 2 + 2000L)))
  }

  test("MERGE records per-clause change rows; insert-only synthesizes") {
    import spark.implicits._
    val path = ds("merge")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-m").toString)
    val srcDir = Files.createTempDirectory("graft-cdf-src").toString
    Seq((3L, 111L), (107L, 222L), (990L, 333L))
      .toDF("sid", "sval").write.parquet(s"$srcDir/src.parquet")
    eng.sql(s"""MERGE INTO '$path' t USING '$srcDir/src.parquet' s
      | ON t.id = s.sid
      | WHEN MATCHED AND s.sval > 200 THEN DELETE
      | WHEN MATCHED THEN UPDATE SET score = s.sval
      | WHEN NOT MATCHED THEN INSERT (id, payload, score)
      |   VALUES (s.sid, 'new', s.sval)""".stripMargin)
    val f = feed(path, 2L)
    val byType = f.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L))
    assert(f.where(F.col("_change_type") === "delete")
      .select("id").collect().head.getLong(0) == 107L)
    assert(f.where(F.col("_change_type") === "update_postimage")
      .select("score").collect().head.getLong(0) == 111L)
    assert(f.where(F.col("_change_type") === "insert")
      .select("id").collect().head.getLong(0) == 990L)
    // insert-only MERGE: no segment rewrites, feed synthesizes inserts
    Seq((991L, 444L)).toDF("sid", "sval")
      .write.parquet(s"$srcDir/src2.parquet")
    eng.sql(s"""MERGE INTO '$path' t USING '$srcDir/src2.parquet' s
      | ON t.id = s.sid
      | WHEN NOT MATCHED THEN INSERT (id, payload, score)
      |   VALUES (s.sid, 'new2', s.sval)""".stripMargin)
    val f2 = feed(path, 3L).collect()
    assert(f2.length == 1)
    assert(f2.head.getAs[String]("_change_type") == "insert")
    assert(f2.head.getAs[Long]("id") == 991L)
  }

  test("a restore that changes deletion vectors on surviving segments " +
       "without recorded rows rejects loudly (resurrection guard)") {
    val path = ds("dvguard")
    val eng = Engine(spark)
    eng.sql(s"DELETE VECTORED FROM '$path' WHERE id = 7") // v3: cdc + dv
    // a range crossing the vectored delete itself is FINE — its rows
    // are recorded
    assert(feed(path, 2L, Some(3L))
      .select("_change_type").collect().map(_.getString(0)).toSeq ==
      Seq("delete"))
    Versioned.restore(spark, path, 2L) // v4: dv REMOVED, no cdc rows
    // id 7 re-entered the table with no segment change and no recorded
    // rows — the feed cannot synthesize that; it must reject, not skip
    val ex = intercept[IllegalArgumentException] {
      feed(path, 3L, Some(4L)).collect()
    }
    assert(ex.getMessage.contains("re-seed") &&
      ex.getMessage.contains("deletion vectors"),
      s"expected the dv-change rejection, got: ${ex.getMessage}")
    // and the symmetric direction: restoring BACK to the vectored
    // snapshot ADDS a dv to a carried segment without rows — same guard
    Versioned.restore(spark, path, 3L) // v5: dv re-added, no cdc rows
    val ex2 = intercept[IllegalArgumentException] {
      feed(path, 4L, Some(5L)).collect()
    }
    assert(ex2.getMessage.contains("deletion vectors"))
    // ranges that do not cross the restores still read fine
    assert(feed(path, 0L, Some(2L)).count() == 200L)
  }

  test("reorganizations are explicit no-ops; legacy removals reject") {
    val path = ds("reorg")
    Versioned.compact(spark, path, targetBytes = 1L << 40)
    assert(feed(path, 2L).count() == 0L)
    Versioned.optimizeZorderSegments(spark, path, Seq("id", "score"), 2)
    assert(feed(path, 2L).count() == 0L)
    // feed across everything = the original inserts only
    assert(feed(path, 0L).count() == 200L)
    // a version that removed segments with NO recorded change rows
    // (simulating a legacy DML) rejects loudly
    val segs = Versioned.headSegments(spark, path)
    assert(segs.length == 2)
    graft.sources.Versioned.commitSegments(spark, path, Seq(segs.head))
    val e = intercept[IllegalArgumentException](feed(path, 0L).count())
    assert(e.getMessage.contains("removed segments"))
    // but a range STOPPING before it still serves
    assert(feed(path, 0L, Some(4L)).count() == 200L)
  }

  test("SQL surface: FOR CHANGE_FEED composes with SELECT") {
    val path = ds("sql")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-s").toString)
    eng.sql(s"DELETE FROM '$path' WHERE id % 100 = 9")
    val out = eng.sql(
      s"""SELECT _change_type, COUNT() AS n, SUM(id) AS ids
         |FROM '$path' FOR CHANGE_FEED FROM 2
         |GROUP BY _change_type""".stripMargin).df.collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "delete")
    assert(out.head.getLong(1) == 2L)
    assert(out.head.getLong(2) == 9L + 109L)
  }

  test("schema evolution: old change rows align to the head schema") {
    import spark.implicits._
    val path = ds("evo")
    // widen with a trailing column, then delete across old+new rows
    Versioned.commit(
      Seq((200L, "p200", 400L, "en")).toDF("id", "payload", "score", "lang"),
      path)
    Versioned.deleteWhere(spark, path, F.col("id").isin(3L, 200L))
    val f = feed(path, 0L)
    assert(f.columns.toSeq ==
      Seq("id", "payload", "score", "lang", "_change_type",
        "_commit_version"))
    // the synthesized inserts for pre-evolution versions serve NULL lang
    assert(f.where(F.col("_change_type") === "insert" &&
      F.col("id") === 3L).select("lang").collect().head.isNullAt(0))
    val dels = f.where(F.col("_change_type") === "delete").collect()
    assert(dels.map(_.getAs[Long]("id")).sorted.toSeq == Seq(3L, 200L))
    assert(dels.filter(_.getAs[Long]("id") == 200L)
      .head.getAs[String]("lang") == "en")
  }

  test("OPTIMIZE PURGE materializes vectors by deleted fraction") {
    val path = ds("purge")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-p").toString)
    // segment 1 (ids 0..99): 50% vectored away; segment 2: untouched
    eng.sql(s"DELETE VECTORED FROM '$path' WHERE id < 100 AND id % 2 = 0")
    val before = dataFingerprint(path)
    val beforeSegs = Versioned.headSegments(spark, path)
    // threshold above the fraction: nothing qualifies, head unchanged
    var st = eng.sql(s"OPTIMIZE '$path' PURGE THRESHOLD 0.9").df
      .collect().head
    assert(st.getLong(1) == 0L)
    assert(Versioned.headSegments(spark, path) == beforeSegs)
    // threshold below: exactly the vectored segment rewrites, in place
    st = eng.sql(s"OPTIMIZE '$path' PURGE THRESHOLD 0.3").df
      .collect().head
    assert(st.getLong(1) == 1L)
    val after = Versioned.headSegments(spark, path)
    assert(after.size == 2 && after.last == beforeSegs.last,
      s"purge must replace in place: $beforeSegs -> $after")
    assert(after.head != beforeSegs.head)
    // the untouched segment carried byte-identical; no vectors remain
    val fp = dataFingerprint(path)
    assert(before.filter(_._1.startsWith(beforeSegs.last)).toSet
      .subsetOf(fp.toSet))
    assert(Versioned.read(spark, path).count() == 150L)
    assert(Versioned.rowCount(spark, path) == 150L)
    // data-neutral for the feed
    assert(feed(path, 3L).count() == 0L)
    // a FULLY-deleted segment drops from the manifest without output
    eng.sql(s"DELETE VECTORED FROM '$path' WHERE id >= 100")
    val (v, n) = Versioned.purgeVectors(spark, path)
    assert(n == 1)
    assert(Versioned.headSegments(spark, path).size == 1)
    assert(Versioned.read(spark, path, Some(v)).count() == 50L)
  }

  test("RESTORE rolls back as a new commit; history stays readable") {
    val path = ds("restore")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-r").toString)
    eng.sql(s"DELETE FROM '$path' WHERE id < 50") // v3: the bad run
    assert(Versioned.read(spark, path).count() == 150L)
    val st = eng.sql(s"RESTORE '$path' TO VERSION 2").df.collect().head
    assert(st.getLong(0) == 4L && st.getLong(1) == 2L)
    assert(Versioned.read(spark, path).count() == 200L)
    // the bad snapshot is still readable for the post-mortem
    assert(Versioned.read(spark, path, Some(3L)).count() == 150L)
    // the restore removed v3's rewrite segment with no recorded change
    // rows — feed ranges crossing it reject loudly
    val e = intercept[IllegalArgumentException](feed(path, 3L).count())
    assert(e.getMessage.contains("removed segments"))
    // audit trail names the operation and its target
    val hist = eng.sql(s"DESCRIBE HISTORY '$path'").df.collect()
    assert(hist.find(_.getLong(0) == 4L).get
      .getAs[String]("operation") == "restore(2)")
    assert(hist.find(_.getLong(0) == 3L).get
      .getAs[String]("operation") == "delete")
    // nonexistent target rejects loudly
    assertThrows[Exception](
      eng.sql(s"RESTORE '$path' TO VERSION 99"))
    // DML after a restore proceeds normally on the restored head
    eng.sql(s"DELETE FROM '$path' WHERE id = 7")
    assert(Versioned.read(spark, path).count() == 199L)
  }

  test("CHECK constraints fence every write path") {
    import spark.implicits._
    val path = ds("check")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-k").toString)
    eng.sql(s"ALTER '$path' ADD CONSTRAINT score_nonneg " +
      "CHECK (score >= 0)")
    assert(eng.sql(s"SHOW CONSTRAINTS '$path'").df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("score_nonneg", "score >= 0")))
    // the DDL audits in history
    val hist = eng.sql(s"DESCRIBE HISTORY '$path'").df.collect()
    assert(hist.last.getAs[String]("operation") ==
      "add-constraint(score_nonneg)")
    // a compliant append passes; a violating one rejects LOUDLY with
    // the constraint's name, before any data lands
    Versioned.commit(Seq((500L, "ok", 5L)).toDF("id", "payload", "score"),
      path)
    val e1 = intercept[IllegalArgumentException](Versioned.commit(
      Seq((501L, "bad", -1L)).toDF("id", "payload", "score"), path))
    assert(e1.getMessage.contains("score_nonneg"))
    assert(Versioned.read(spark, path).count() == 201L)
    // DML rewrites are fenced too: an UPDATE that would write a
    // violating row fails, head unchanged
    val e2 = intercept[Exception](
      eng.sql(s"UPDATE '$path' SET score = -9 WHERE id = 3"))
    assert(e2.getMessage.contains("score_nonneg"))
    assert(Versioned.read(spark, path)
      .where(F.col("score") < 0).count() == 0L)
    // ... and the vectored UPDATE's replacement segment likewise
    val e3 = intercept[Exception](
      eng.sql(s"UPDATE VECTORED '$path' SET score = 0 - score " +
        "WHERE id = 4"))
    assert(e3.getMessage.contains("score_nonneg"))
    // ADD over non-compliant existing data rejects with a sample
    val e4 = intercept[Exception](
      eng.sql(s"ALTER '$path' ADD CONSTRAINT small_ids CHECK (id < 10)"))
    assert(e4.getMessage.contains("existing rows violate"))
    // DROP lifts the fence
    eng.sql(s"ALTER '$path' DROP CONSTRAINT score_nonneg")
    Versioned.commit(Seq((502L, "now ok", -1L))
      .toDF("id", "payload", "score"), path)
    assert(Versioned.read(spark, path)
      .where(F.col("score") < 0).count() == 1L)
    assert(eng.sql(s"SHOW CONSTRAINTS '$path'").df.count() == 0L)
  }

  test("a crashed constraint drop surfaces as pending-drop, never " +
    "silently (audit commit landed, file removal did not)") {
    import spark.implicits._
    val path = ds("pend")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-p").toString)
    eng.sql(s"ALTER '$path' ADD CONSTRAINT score_nonneg " +
      "CHECK (score >= 0)")
    assert(Versioned.pendingConstraintDrops(spark, path).isEmpty)
    // simulate dropConstraint's crash window: the audit commit lands
    // (commit-first, fail-safe direction), the constraint-file update
    // never does — replicate the first half of dropConstraint verbatim
    val hv = Versioned.versions(spark, path).last
    Versioned.commitSegments(spark, path,
      Versioned.headSegments(spark, path, Some(hv)),
      Versioned.readDvMap(spark, path, hv), expectedBase = Some(hv),
      op = "drop-constraint(score_nonneg)"): Unit
    // the constraint still ENFORCES (over-enforcement is the
    // documented fail-safe) ...
    val e = intercept[Exception](Versioned.commit(
      Seq((900L, "neg", -5L)).toDF("id", "payload", "score"), path))
    assert(e.getMessage.contains("score_nonneg"))
    // ... but the disagreement with history is LOUD, not silent
    assert(Versioned.pendingConstraintDrops(spark, path) ==
      Set("score_nonneg"))
    val shown = eng.sql(s"SHOW CONSTRAINTS '$path'").df.collect()
    assert(shown.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("score_nonneg", "pending-drop")))
    // the marker survives VACUUM retiring the audit commit's manifest:
    // the drop op rolls up into constraint-ops.txt before it dies
    Versioned.commit(Seq((903L, "more", 3L))
      .toDF("id", "payload", "score"), path)
    Versioned.vacuum(spark, path, keepVersions = 1)
    assert(Versioned.pendingConstraintDrops(spark, path) ==
      Set("score_nonneg"))
    // re-running the drop converges: enforcement lifts, marker clears
    eng.sql(s"ALTER '$path' DROP CONSTRAINT score_nonneg")
    assert(Versioned.pendingConstraintDrops(spark, path).isEmpty)
    assert(eng.sql(s"SHOW CONSTRAINTS '$path'").df.count() == 0L)
    // a re-ADDED constraint is enforced, not pending (newest op wins)
    eng.sql(s"ALTER '$path' ADD CONSTRAINT score_nonneg " +
      "CHECK (score >= 0)")
    assert(Versioned.pendingConstraintDrops(spark, path).isEmpty)
  }

  test("changeFeed spans a removal-then-restore re-add: the restored " +
    "segment's rows surface as synthesized inserts at BOTH versions") {
    import spark.implicits._
    val path = freshPath("restore-readd")
    // v1: segA; v2: append segB; v3: republish WITHOUT segA's rows
    // (neutral reorg would reject — use a delete that empties segA);
    // v4: restore(2) re-references segA — its name recurs
    Versioned.commit((1L to 5L).map(i => (i, s"a$i")).toDF("id", "v"), path)
    Versioned.commit((11L to 15L).map(i => (i, s"b$i")).toDF("id", "v"),
      path, append = true)
    val eng = Engine(spark)
    eng.sql(s"DELETE FROM '$path' WHERE id <= 5")
    Versioned.restore(spark, path, 2L)
    val f = feed(path, 0).select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // segA's five rows insert at v1 AND again at the restore version
    val segAInserts = f.filter(x => x._1 <= 5 && x._2 == "insert")
      .groupBy(_._3).view.mapValues(_.length).toMap
    assert(segAInserts(1L) == 5, s"v1 inserts: $segAInserts")
    assert(segAInserts.keySet.exists(_ > 3L),
      s"restore re-add must surface as inserts: $segAInserts")
    // the delete's retraction rows are present between the two epochs
    assert(f.count(x => x._1 <= 5 && x._2 == "delete") == 5)
    // head equals v2's content — and the feed's NET effect agrees
    assert(Versioned.read(spark, path).count() == 10)
  }

  test("a stray near-miss file in the manifest dir is tolerated, not " +
    "a dataset-bricking NumberFormatException") {
    import spark.implicits._
    val path = freshPath("junkfile")
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new org.apache.hadoop.fs.Path(s"$path/manifest/v-backup.txt")
    val out = fs.create(junk, false)
    try out.write("not a manifest".getBytes("UTF-8")) finally out.close()
    assert(Versioned.versions(spark, path) == Seq(1L))
    assert(Versioned.read(spark, path).count() == 1)
    Versioned.commit(Seq((2L, "b")).toDF("id", "v"), path, append = true)
    assert(Versioned.read(spark, path).count() == 2)
  }

  test("VACUUM DRY RUN forecasts without deleting") {
    val path = ds("dry")
    val eng = Engine(spark, Files.createTempDirectory("graft-cdf-d").toString)
    eng.sql(s"DELETE FROM '$path' WHERE id < 50") // v3 rewrites segment 1
    val dry = eng.sql(s"VACUUM '$path' KEEP 1 DRY RUN").df.collect().head
    assert(dry.getLong(0) == 2L, s"would_drop_versions: $dry") // v1, v2
    assert(dry.getLong(1) == 1L, s"would_delete_segments: $dry")
    assert(dry.getLong(3) == 0L) // v3's change rows are RETAINED
    assert(dry.getLong(4) > 0L)  // the original segment's bytes
    // the forecast touched NOTHING
    assert(Versioned.versions(spark, path) == Seq(1L, 2L, 3L))
    assert(Versioned.read(spark, path, Some(1L)).count() == 100L)
    assert(feed(path, 2L).count() == 50L) // change rows intact
    // the real run matches its forecast
    val st = Versioned.vacuum(spark, path, keepVersions = 1)
    assert(st.versionsDropped == 2 && st.segmentsDeleted == 1)
    assert(st.bytesFreed == dry.getLong(4))
    assert(Versioned.versions(spark, path) == Seq(3L))
  }

  test("vacuum retires change rows with their versions") {
    import spark.implicits._
    val path = ds("vac")
    Versioned.deleteWhere(spark, path, F.col("id") === 7L) // v3, has _cdc
    assert(feed(path, 2L).count() == 1L)
    Versioned.commit(Seq((300L, "p300", 600L))
      .toDF("id", "payload", "score"), path) // v4
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdcDir = new org.apache.hadoop.fs.Path(s"$path/_cdc")
    assert(fs.listStatus(cdcDir).length == 1) // v3's change rows
    Versioned.vacuum(spark, path, keepVersions = 1)
    // v3's manifest dropped — its change-feed dir goes with it
    assert(!fs.exists(cdcDir) || fs.listStatus(cdcDir).isEmpty)
  }

  test("a long history reads as TWO batched scans, not one plan leg " +
       "per version") {
    import spark.implicits._
    val path = freshPath("long")
    // 220 single-row append commits + 2 recorded-CDC DML commits: a
    // year of hourly commits in miniature. Batched single-partition
    // writes keep the setup fast; the READER must stay O(1) legs.
    val one = (id: Long) =>
      Seq((id, s"p$id", id * 2)).toDF("id", "payload", "score").coalesce(1)
    (1L to 220L).foreach(i => Versioned.commit(one(i), path))
    Versioned.deleteWhere(spark, path, F.col("id") === 13L)  // v221, CDC
    Versioned.deleteWhere(spark, path, F.col("id") === 77L)  // v222, CDC
    val df = feed(path, 0L)
    // attribution survives the batching: every version, every row
    assert(df.count() == 220L + 2L)
    val byV = df.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV.size == 222)
    assert((1L to 220L).forall(v => byV(v) == 1L))
    assert(byV(221L) == 1L && byV(222L) == 1L)
    assert(df.where(F.col("_change_type") === "delete").count() == 2L)
    // THE SCALE ASSERTION: the plan carries at most two file scans
    // (synthesized inserts + recorded change rows) however long the
    // history — a per-version union would put 222 legs here and
    // degrade linearly with history length
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length <= 2,
      s"changeFeed planned ${scans.length} file scans over a " +
        "222-version history — the per-version union is back")
    // version slicing composes with the batched read
    val sliced = Versioned.changeFeed(spark, path, 100L, Some(110L))
    assert(sliced.count() == 10L)
    assert(sliced.agg(F.min("_commit_version"), F.max("_commit_version"))
      .collect().head match { case r => r.getLong(0) == 101L && r.getLong(1) == 110L })
  }

  test("constraint DDL: versioned files, no empty-set window, CAS " +
       "rollback restores the prior set") {
    import spark.implicits._
    val path = ds("consfile")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    def consFiles() = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(_.startsWith("constraints")).sorted.toSeq
    // legacy single-file layout reads as index -1 (pre-round-12 data)
    val legacy = new org.apache.hadoop.fs.Path(mdir, "constraints.txt")
    val out = fs.create(legacy, false)
    out.write("legacy_pos\tscore >= 0".getBytes("UTF-8")); out.close()
    assert(Versioned.constraints(spark, path) ==
      Map("legacy_pos" -> "score >= 0"))
    // ADD installs a NEW versioned file and retires the legacy one
    // only after the audit commit — never a window with no file
    Versioned.addConstraint(spark, path, "id_pos", "id >= 0")
    assert(consFiles() == Seq("constraints-000000000.txt"))
    assert(Versioned.constraints(spark, path).keySet ==
      Set("legacy_pos", "id_pos"))
    // DROP likewise: a fresh higher-index file, old one retired
    Versioned.dropConstraint(spark, path, "legacy_pos")
    assert(consFiles() == Seq("constraints-000000001.txt"))
    assert(Versioned.constraints(spark, path).keySet == Set("id_pos"))
    // a LOST CAS rolls the install back. Forcing the collision
    // DETERMINISTICALLY: the ADD's existing-data validation scan
    // evaluates the constraint expression BETWEEN the head read and
    // the audit commit — a UDF inside it plays the interloper,
    // committing (raw manifest copy, no nested Spark job) exactly in
    // that window, so the audit's CAS must fail every run
    val hv = Versioned.versions(spark, path).last
    // the guard is the FILESYSTEM, not a flag: task closures
    // deserialize per task, so an in-closure AtomicBoolean would not
    // be shared — racing copiers collapse on FileAlreadyExists
    spark.udf.register("graft_sneak_commit", () => {
      val m = java.nio.file.Paths.get(path, "manifest")
      try java.nio.file.Files.copy(
        m.resolve(f"v-$hv%09d.txt"),
        m.resolve(f"v-${hv + 1}%09d.txt"))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      true
    })
    val before = Versioned.constraints(spark, path)
    val ex = intercept[IllegalStateException](
      Versioned.addConstraint(spark, path, "never_lands",
        "graft_sneak_commit() AND score < 1000000"))
    assert(ex.getMessage.contains("concurrent commit"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      path, "manifest", f"v-${hv + 1}%09d.txt")),
      "the interloper never fired — the validation scan did not " +
        "evaluate the expression")
    assert(Versioned.constraints(spark, path) == before,
      "a failed audit commit left its constraint installed")
    assert(consFiles() == Seq("constraints-000000001.txt"))
  }

  test("a LATER constraint DDL cannot hide a crashed drop: the " +
    "copy-forward completes it instead of re-copying the stale name") {
    import spark.implicits._
    val path = ds("pendddl")
    Versioned.addConstraint(spark, path, "score_nonneg", "score >= 0")
    Versioned.addConstraint(spark, path, "id_pos", "id >= 0")
    // crash dropConstraint(score_nonneg) after its audit commit
    val hv = Versioned.versions(spark, path).last
    Versioned.commitSegments(spark, path,
      Versioned.headSegments(spark, path, Some(hv)),
      Versioned.readDvMap(spark, path, hv), expectedBase = Some(hv),
      op = "drop-constraint(score_nonneg)"): Unit
    assert(Versioned.pendingConstraintDrops(spark, path) ==
      Set("score_nonneg"))
    // the regression this pins: a LATER add used to copy the stale
    // name forward into a fresh file whose recency basis postdated the
    // crashed drop's commit — SHOW CONSTRAINTS said "enforced" while
    // history's newest op for the name was drop-constraint. Now the
    // copy-forward consults pendingConstraintDrops and COMPLETES the
    // drop (its audit commit already landed).
    Versioned.addConstraint(spark, path, "payload_len",
      "length(payload) > 0")
    assert(Versioned.constraints(spark, path).keySet ==
      Set("id_pos", "payload_len"),
      "the crashed drop's name was copied forward")
    assert(Versioned.pendingConstraintDrops(spark, path).isEmpty)
    // the completed drop really lifted enforcement
    Versioned.commit(Seq((700L, "neg ok", -1L))
      .toDF("id", "payload", "score"), path): Unit
    // and a DROP of another name converges a pending one the same way
    val hv2 = Versioned.versions(spark, path).last
    Versioned.commitSegments(spark, path,
      Versioned.headSegments(spark, path, Some(hv2)),
      Versioned.readDvMap(spark, path, hv2), expectedBase = Some(hv2),
      op = "drop-constraint(id_pos)"): Unit
    assert(Versioned.pendingConstraintDrops(spark, path) == Set("id_pos"))
    Versioned.dropConstraint(spark, path, "payload_len")
    assert(Versioned.constraints(spark, path).isEmpty
      || Versioned.constraints(spark, path).keySet == Set.empty[String])
    assert(Versioned.pendingConstraintDrops(spark, path).isEmpty)
  }

  test("pending-drop reconciliation is version-bounded: vacuum " +
    "advances the rollup watermark past data commits") {
    import spark.implicits._
    val path = ds("recwm")
    Versioned.addConstraint(spark, path, "score_nonneg", "score >= 0")
    // a pile of data commits after the DDL — the A2 shape (constraints
    // set once, then only data)
    (0 until 5).foreach { i =>
      Versioned.commit(Seq((800L + i, s"d$i", i.toLong))
        .toDF("id", "payload", "score"), path): Unit
    }
    // vacuum (retaining everything) folds ops + watermark into the
    // rollup even with nothing retired
    Versioned.vacuum(spark, path, keepVersions = 100)
    val head = Versioned.versions(spark, path).last
    val (ops, reconciled) = Versioned.readConstraintOpsRollup(spark, path)
    assert(reconciled.contains(head),
      s"watermark $reconciled != head $head")
    assert(ops.get("score_nonneg").exists(_._3 == "add"))
    // a crashed drop ABOVE the watermark is still found...
    val hv = Versioned.versions(spark, path).last
    Versioned.commitSegments(spark, path,
      Versioned.headSegments(spark, path, Some(hv)),
      Versioned.readDvMap(spark, path, hv), expectedBase = Some(hv),
      op = "drop-constraint(score_nonneg)"): Unit
    assert(Versioned.pendingConstraintDrops(spark, path) ==
      Set("score_nonneg"))
    // ...and survives ANOTHER vacuum retiring its manifest, through
    // the install-then-retire rollup update (versioned filenames — a
    // crash between steps can no longer lose prior entries)
    Versioned.commit(Seq((900L, "tail", 1L))
      .toDF("id", "payload", "score"), path): Unit
    Versioned.vacuum(spark, path, keepVersions = 1)
    assert(Versioned.pendingConstraintDrops(spark, path) ==
      Set("score_nonneg"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/manifest"))
      .map(_.getPath.getName).filter(_.startsWith("constraint-ops")).toSeq
    assert(names.length == 1 && names.head.matches(
      "constraint-ops-\\d{9}\\.txt"), s"rollup files: $names")
  }

  test("legacy unversioned rollup files read as index -1 and upgrade " +
    "on the next install") {
    import spark.implicits._
    val path = ds("legacyroll")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    // seed OLD-layout rollups (pre-round-15 single filenames)
    def seed(name: String, text: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(mdir, name), false)
      out.write(text.getBytes("UTF-8")); out.close()
    }
    seed("txn-watermarks.txt", "appA\t42")
    seed("constraint-ops.txt", "old_check\t1\t0\tdrop")
    assert(Versioned.lastTxn(spark, path, "appA").contains(42L))
    val (ops0, rec0) = Versioned.readConstraintOpsRollup(spark, path)
    assert(ops0 == Map("old_check" -> ((1L, 0L, "drop"))) && rec0.isEmpty)
    // next vacuum installs a versioned constraint-ops file, merging
    // the legacy content and retiring the old name (the txn rollup
    // only rewrites when retired manifests carried #txn lines — its
    // legacy file stays readable as index -1 until then)
    Versioned.vacuum(spark, path, keepVersions = 1)
    val names = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(_.startsWith("constraint-ops")).sorted.toSeq
    assert(names == Seq("constraint-ops-000000000.txt"), s"rollups: $names")
    assert(Versioned.lastTxn(spark, path, "appA").contains(42L))
    val (ops1, rec1) = Versioned.readConstraintOpsRollup(spark, path)
    assert(ops1.get("old_check").exists(_._3 == "drop") && rec1.nonEmpty)
  }
}
