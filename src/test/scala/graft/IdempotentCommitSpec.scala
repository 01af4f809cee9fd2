package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

import graft.sources.Versioned
import graft.streaming.Streams

/** Idempotent commits (`txn = (app, batchId)`) and the exactly-once
  * streaming sink built on them: a replayed batch is a no-op, apps
  * are independent watermarks, and the watermark survives vacuum. */
class IdempotentCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-txn-$tag").toString + "/ds"

  test("replayed batchId is a no-op; later batches apply") {
    val path = freshPath("replay")
    def batch(ids: Range) = ids.map(i => (i.toLong, s"p$i")).toDF("id", "p")
    val v1 = Versioned.commit(batch(0 until 10), path,
      txn = Some(("ingest", 0L)))
    assert(v1 == 1L)
    assert(Versioned.lastTxn(spark, path, "ingest").contains(0L))
    // the retry: same app, same batchId — returns head, appends nothing
    val v1b = Versioned.commit(batch(0 until 10), path,
      txn = Some(("ingest", 0L)))
    assert(v1b == 1L)
    assert(Versioned.read(spark, path).count() == 10L)
    // a replay of an OLDER batch is also suppressed
    val v2 = Versioned.commit(batch(10 until 20), path,
      txn = Some(("ingest", 1L)))
    assert(v2 == 2L)
    assert(Versioned.commit(batch(0 until 10), path,
      txn = Some(("ingest", 0L))) == 2L)
    assert(Versioned.read(spark, path).count() == 20L)
    assert(Versioned.lastTxn(spark, path, "ingest").contains(1L))
    // a DIFFERENT app's batch 0 is independent
    val v3 = Versioned.commit(batch(100 until 105), path,
      txn = Some(("backfill", 0L)))
    assert(v3 == 3L)
    assert(Versioned.read(spark, path).count() == 25L)
    assert(Versioned.lastTxn(spark, path, "backfill").contains(0L))
    // untagged commits never move any app's watermark
    Versioned.commit(batch(200 until 201), path)
    assert(Versioned.lastTxn(spark, path, "ingest").contains(1L))
  }

  test("watermark survives vacuum of the txn-bearing versions") {
    val path = freshPath("vac")
    Versioned.commit(Seq((1L, "a")).toDF("id", "p"), path,
      txn = Some(("app", 7L)))
    Versioned.commit(Seq((2L, "b")).toDF("id", "p"), path)
    Versioned.commit(Seq((3L, "c")).toDF("id", "p"), path)
    Versioned.vacuum(spark, path, keepVersions = 1)
    assert(Versioned.versions(spark, path) == Seq(3L))
    assert(Versioned.lastTxn(spark, path, "app").contains(7L))
    // the replay of batch 7 after retention still suppresses
    val v = Versioned.commit(Seq((1L, "a")).toDF("id", "p"), path,
      txn = Some(("app", 7L)))
    assert(v == 3L)
    assert(Versioned.read(spark, path).count() == 3L)
  }

  test("exactly-once streaming sink: a real micro-batched pipeline") {
    implicit val sq = spark.sqlContext
    val path = freshPath("sink")
    val ckpt = Files.createTempDirectory("graft-txn-ck").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().select(F.col("_1").as("id"),
      F.col("_2").as("p"))
    val q = docs.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Streams.versionedSink(path, "stream-ingest"))
      .start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((3L, "c"))
      q.processAllAvailable()
      assert(Versioned.read(spark, path).count() == 3L)
      val lastBatch = Versioned.lastTxn(spark, path, "stream-ingest").get
      // simulate the post-crash REPLAY: the sink function re-invoked
      // with an already-committed batchId appends nothing
      Streams.versionedSink(path, "stream-ingest")(
        Seq((1L, "a"), (2L, "b")).toDF("id", "p"), 0L)
      assert(Versioned.read(spark, path).count() == 3L)
      assert(Versioned.lastTxn(spark, path, "stream-ingest")
        .contains(lastBatch))
      // the feed sees exactly the three ingested rows as inserts
      assert(Versioned.changeFeed(spark, path, 0L)
        .where(F.col("_change_type") === "insert").count() == 3L)
    } finally q.stop()
  }

  test("optimistic appends: 8 concurrent committers all land") {
    val path = freshPath("race")
    Versioned.commit(Seq((0L, "seed")).toDF("id", "p"), path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 8).map { w =>
      Future {
        Versioned.commit(
          (w * 100 until w * 100 + 10).map(i => (i.toLong, s"w$w"))
            .toDF("id", "p"),
          path, maxRetries = 32)
      }
    }
    val landed = Await.result(Future.sequence(writers), 120.seconds)
    // every writer won SOME version; versions are dense 1..9
    assert(landed.toSet.size == 8)
    assert(Versioned.versions(spark, path) == (1L to 9L))
    val df = Versioned.read(spark, path)
    assert(df.count() == 81L)
    (1 to 8).foreach { w =>
      assert(df.where(F.col("p") === s"w$w").count() == 10L,
        s"writer $w's rows were lost in the race")
    }
    // without retries the loser still fails loudly (the DML contract)
    Versioned.commit(Seq((1000L, "x")).toDF("id", "p"), path)
    assert(Versioned.read(spark, path).count() == 82L)
  }

  test("suppressed retry after a lost race sweeps its orphan segment") {
    val path = freshPath("orphseg")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Versioned.commit(Seq((1L, "a")).toDF("id", "p"), path,
      txn = Some(("app", 0L)))
    val segsBefore = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/data")).length
    // replay of batch 0: suppressed BEFORE writing any segment
    Versioned.commit(Seq((1L, "a")).toDF("id", "p"), path,
      txn = Some(("app", 0L)), maxRetries = 5)
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/data")).length == segsBefore)
  }

  test("txn identity is atomic with the manifest: no phantom watermark") {
    val path = freshPath("orphan")
    Versioned.commit(Seq((1L, "a")).toDF("id", "p"), path)
    // a stray side file (e.g. from a foreign tool or an older layout)
    // is ignored: the watermark lives INSIDE committed manifests only
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = new org.apache.hadoop.fs.Path(
      s"$path/manifest/v-000000002.txn.txt")
    val out = fs.create(stray, true)
    out.write("ingest\t99".getBytes("UTF-8")); out.close()
    assert(Versioned.lastTxn(spark, path, "ingest").isEmpty)
    assert(Versioned.versions(spark, path) == Seq(1L)) // not a version
    Versioned.commit(Seq((2L, "b")).toDF("id", "p"), path)
    assert(Versioned.lastTxn(spark, path, "ingest").isEmpty)
    // a real watermark lands with its manifest, atomically
    val v3 = Versioned.commit(Seq((3L, "c")).toDF("id", "p"), path,
      txn = Some(("ingest", 5L)))
    assert(v3 == 3L)
    assert(Versioned.lastTxn(spark, path, "ingest").contains(5L))
    assert(Versioned.read(spark, path).count() == 3L)
  }

  test("append vs DML contention: both land in order, no lost " +
       "segments or vectors, under forced version collisions") {
    val path = freshPath("apdml")
    // 4 segments, disjoint id ranges; ids 0..399
    (0 until 4).foreach { s =>
      Versioned.commit((s * 100 until s * 100 + 100)
        .map(i => (i.toLong, s"seg$s")).toDF("id", "p"), path)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the DML CONTRACT: detection+rewrite pin ONE head (expectedBase
    // CAS) and a moved head fails LOUDLY — the CALLER retries on the
    // fresh head, exactly how Delta/Iceberg DML behaves under
    // optimistic concurrency. The appender retries internally
    // (commit's maxRetries); the DML side retries the whole statement.
    def retryDml[T](what: String)(body: => T): T = {
      var last: Throwable = null
      (1 to 64).foreach { _ =>
        try return body
        catch { case e: IllegalStateException => last = e }
      }
      throw new AssertionError(s"$what never won a CAS in 64 tries", last)
    }
    val appender = Future {
      (1 to 6).map { w =>
        Versioned.commit((1000L + w * 10 until 1000L + w * 10 + 10)
          .map(i => (i.toLong, s"app$w")).toDF("id", "p"),
          path, maxRetries = 64)
      }
    }
    val deleter = Future {
      // COW delete (segment rewrite) + vectored delete (DV attach):
      // both read-set-pinned paths race the appends
      val a = retryDml("deleteWhere")(
        Versioned.deleteWhere(spark, path, F.col("id") === 150L))
      val b = retryDml("deleteWhereVectored")(
        Versioned.deleteWhereVectored(spark, path, F.col("id") === 250L))
      (a, b)
    }
    val updater = Future {
      retryDml("updateWhereVectored")(
        Versioned.updateWhereVectored(spark, path,
          F.col("id") === 350L,
          Seq("p" -> F.lit("updated"))))
    }
    val appended = Await.result(appender, 180.seconds)
    val (vDel, vVec) = Await.result(deleter, 180.seconds)
    val vUpd = Await.result(updater, 180.seconds)._1
    // every writer landed; versions are DENSE (no number skipped, no
    // commit overwritten) and each op's audit line is in the history
    val vs = Versioned.versions(spark, path)
    assert(vs == (1L to vs.last), s"version history has holes: $vs")
    assert((appended ++ Seq(vDel, vVec, vUpd)).toSet.subsetOf(vs.toSet))
    assert(appended.toSet.intersect(Set(vDel, vVec, vUpd)).isEmpty,
      "two writers claim the same version")
    // the final state composes ALL of them: 400 base - 2 deletes,
    // 60 appended, the update applied, every appender's rows present
    val df = Versioned.read(spark, path)
    assert(df.count() == 400L - 2L + 60L)
    assert(df.where(F.col("id").isin(150L, 250L)).count() == 0L,
      "a delete was lost in the race")
    assert(df.where(F.col("id") === 350L).select("p")
      .collect().head.getString(0) == "updated",
      "the vectored update was lost in the race")
    (1 to 6).foreach { w =>
      assert(df.where(F.col("p") === s"app$w").count() == 10L,
        s"appender $w's segment fell out of the lineage")
    }
    // deletion vectors survived every interleaving: the DV'd rows
    // stay gone at the HEAD even after later commits carried the map
    assert(df.where(F.col("id") === 250L).count() == 0L)
  }
}
