package graft.trace

import org.apache.spark.sql.SparkSession

/** Single-query bench harness: runs named [[graft.SparkEntry.queries]]
  * entries repeatedly with per-run wall time and a per-stage breakdown —
  * the fast iteration loop for plan/latency tuning without the full
  * `graft.Bench` sweep. Session config mirrors Bench exactly.
  *
  * Env knobs (for A/B experiments):
  *   SPARK_GRAFT_SF_DIR  data dir       (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_REPS    timed runs     (default 3, after 1 warmup)
  *   SPARK_GRAFT_CLEAN   "0" disables the between-run unpersist sweep
  *   SPARK_GRAFT_MINPART AQE coalesce minPartitionSize (default as Bench)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val clean = sys.env.getOrElse("SPARK_GRAFT_CLEAN", "1") == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
    sys.env.get("SPARK_GRAFT_MINPART").foreach { v =>
      b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_STAGE=1: run over the SAME splittable staged layout
    // the Bench sweep stages (untimed there) — without it, BenchOne's
    // raw-dir numbers carry a layout delta vs in-sweep medians
    // (flagship: ~0.2 s staged vs ~0.5 s raw) and an isolated
    // re-measure can misread sweep context as a reproduced shift
    val sfDirStaged =
      if (sys.env.get("SPARK_GRAFT_STAGE").contains("1"))
        graft.Bench.stageSplittable(spark, sfDir, cpus.toInt)
      else sfDir
    val tracer = new StageTraceListener
    spark.sparkContext.addSparkListener(tracer)

    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDirStaged).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (clean)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      System.gc()
      val w = once() // warmup
      tracer.drain()
      val runs = (1 to reps).map { i =>
        val t = once()
        val stages = tracer.drain()
        println(f"BENCHONE $name run$i%d ${t}%.3f s  stages=${stages.size}  " +
          f"stageWallSum=${stages.map(_.wallMs).sum}%d ms")
        stages.sortBy(-_.wallMs).take(5).foreach { s =>
          println(f"  top stage ${s.stageId}%d tasks=${s.numTasks}%d " +
            f"wall=${s.wallMs}%d ms exec=${s.executorRunMs}%d ms " +
            f"sr=${s.shuffleReadBytes}%d sw=${s.shuffleWriteBytes}%d  ${s.name}")
        }
        t
      }
      println(f"BENCHONE $name warmup=${w}%.3f median=${runs.sorted.apply(reps / 2)}%.3f")
    }
    spark.stop()
  }
}
