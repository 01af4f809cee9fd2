package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.sources.Versioned

/** Round-18 MERGE one-scan fusion + CDC apply fast path: the fused
  * LEFT-join plan (small source, pruned-scan-under-cap) must commit
  * byte-for-row identical results to the classic two-scan plan, the
  * LEFT join's null source side must never fire a clause on unmatched
  * rows, and the applyChanges collected-source path must match the
  * staged path. The conf gates (`graft.merge.fusedScanBytes`,
  * `graft.apply.collectMaxBytes`) force each side of every A/B. */
class MergeFusedSpec extends SparkSpec {

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-fused-$tag").toString + "/ds"

  /** Two segments of 100 rows each (ids [0,100) and [100,200)). */
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

  /** A parquet MERGE source: upserts for ids 90..109 (spanning both
    * segments) + 3 new ids, plus a delete marker column. */
  private def srcPath(tag: String): String = {
    import spark.implicits._
    val p = Files.createTempDirectory(s"graft-fused-src-$tag").toString +
      "/src.parquet"
    ((90 until 110).map(id => (id.toLong, s"u$id", false)) ++
      Seq((500L, "new500", false), (501L, "new501", false),
        (60L, "d60", true))) // 60 exercises the DELETE clause
      .toDF("id", "val", "del")
      .write.parquet(p)
    p
  }

  private val mergeSql = (target: String, src: String) =>
    s"MERGE INTO '$target' t USING '$src' s ON t.id = s.id" +
      " WHEN MATCHED AND s.del THEN DELETE" +
      " WHEN MATCHED THEN UPDATE SET payload = s.val" +
      " WHEN NOT MATCHED THEN INSERT (id, payload, score) " +
      "VALUES (s.id, s.val, 0 - 1)"

  private def withConf[T](k: String, v: String)(body: => T): T =
    Engine.withConfs(spark, cond = true, k -> v)(body)

  test("fused and classic MERGE commit identical tables, counts and " +
    "change feeds") {
    val src = srcPath("ab")
    val (fusedP, classicP) = (ds("fused"), ds("classic"))
    val eng = Engine(spark)
    val rFused = eng.sql(mergeSql(fusedP, src)).df.collect().head
    val rClassic = withConf("graft.merge.fusedScanBytes", "0") {
      eng.sql(mergeSql(classicP, src)).df.collect().head
    }
    // same action counts
    assert(rFused.toSeq.drop(1) === rClassic.toSeq.drop(1))
    // same committed rows
    assert(rows(Versioned.read(spark, fusedP)) ===
      rows(Versioned.read(spark, classicP)))
    // same change rows (minus the per-dataset commit version)
    val hv = Versioned.versions(spark, fusedP).last
    def changes(p: String) = rows(Versioned
      .changeFeed(spark, p, hv - 1, Some(hv)).drop("_commit_version"))
    assert(changes(fusedP) === changes(classicP))
    assert(changes(fusedP).nonEmpty)
  }

  test("a source-only clause condition does not fire on unmatched rows " +
    "under fusion (LEFT-join null mask)") {
    import spark.implicits._
    val path = ds("mask")
    val p = Files.createTempDirectory("graft-fused-src-mask").toString +
      "/src.parquet"
    // source hits ONLY id 10; its marker column is null
    Seq((10L, null.asInstanceOf[String]))
      .toDF("id", "marker").write.parquet(p)
    val before = Versioned.read(spark, path).count()
    // `s.marker IS NULL` is TRUE on the null source side of every
    // unmatched row — without the __win mask the fused plan would
    // delete the whole candidate segment
    Engine(spark).sql(
      s"MERGE INTO '$path' t USING '$p' s ON t.id = s.id" +
        " WHEN MATCHED AND s.marker IS NULL THEN DELETE"): Unit
    assert(Versioned.read(spark, path).count() === before - 1)
  }

  test("cardinality violation still throws under fusion") {
    import spark.implicits._
    val path = ds("card")
    val p = Files.createTempDirectory("graft-fused-src-card").toString +
      "/src.parquet"
    Seq((10L, "a"), (10L, "b")).toDF("id", "val").write.parquet(p)
    val e = intercept[Exception] {
      Engine(spark).sql(
        s"MERGE INTO '$path' t USING '$p' s ON t.id = s.id" +
          " WHEN MATCHED THEN UPDATE SET payload = s.val")
    }
    assert(e.getMessage.contains("matches more than"))
  }

  test("applyChanges collected and staged paths converge identically") {
    import spark.implicits._
    val (srcP, repFast, repStaged) =
      (ds("cdc-src"), ds("cdc-fast"), ds("cdc-staged"))
    val hv0 = Versioned.versions(spark, srcP).last
    val eng = Engine(spark)
    eng.sql(s"UPDATE '$srcP' SET score = score + 1 WHERE id < 5"): Unit
    eng.sql(s"DELETE FROM '$srcP' WHERE id = 150"): Unit
    val hv1 = Versioned.versions(spark, srcP).last
    def applyTo(rep: String): Unit =
      graft.streaming.Streams.applyChanges(spark, rep,
        Versioned.changeFeed(spark, srcP, hv0, Some(hv1)), Seq("id"))
    applyTo(repFast) // default: estimate-gated collect + injected source
    withConf("graft.apply.collectMaxBytes", "0") {
      applyTo(repStaged) // forced parquet staging path
    }
    assert(rows(Versioned.read(spark, repFast)) ===
      rows(Versioned.read(spark, repStaged)))
    assert(rows(Versioned.read(spark, repFast)) ===
      rows(Versioned.read(spark, srcP)))
  }
}
