package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — driver contract.
  *
  * Runs the headline queries on `SPARK_GRAFT_SF_DIR`, forcing full
  * materialization through the `noop` sink (a bare `count()` would let
  * Catalyst prune the plan down to a scan-count). Timing mirrors the
  * reference: wall-clock around query execution only, session startup
  * excluded (reference: src/mini_spark/shell.py:91-93); the flagship gets
  * one warmup + 3 timed runs, averaged, to match the reference's
  * avg-of-runs methodology (README.md:163-165).
  */
object Bench {
  private def execTime(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries
    val headline = Seq(
      "q06_q1_flagship", // the BASELINE workload (TPC-H Q1 variant)
      "q02_project_arith", "q05_between_ts", "q11_join_agg", "q12_join3",
      "q17_topk", "q19_events_hourly", "q23_token_stats", "q27_dedup_exact",
      "q28_jaccard_pairs", "q29_minhash_pairs", "q32_knn_brute")

    // warmup: JIT + code cache + parquet footer caches (excluded, like the
    // reference's compile step)
    execTime(qs("q06_q1_flagship")(spark, sfDir))

    val results = headline.map { name =>
      val fn = qs(name)
      val secs =
        if (name == "q06_q1_flagship")
          (1 to 3).map(_ => execTime(fn(spark, sfDir))).sum / 3.0
        else execTime(fn(spark, sfDir))
      name -> secs
    }

    val flagship = results.head._2
    val qjson = results.map { case (k, v) => s""""$k":${f"$v%.4f"}""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"q1_flagship_avg","value":${f"$flagship%.4f"},"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
