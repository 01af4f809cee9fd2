package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference engine's global execution config
  * (reference: src/mini_spark/constants.py:7-9 — ROWS_PER_BLOCK,
  * SHUFFLE_PARTITIONS, WORKER_POOL_PROCESSES) but expressed as Spark
  * session conf. All sizing is cluster-oriented: the same settings that
  * run local[32] here scale to a 1000-executor cluster because nothing
  * below depends on local mode.
  */
object GraftSession {

  /** Default shuffle parallelism for local test runs. On a real cluster
    * AQE coalesces this upward/downward from runtime statistics, so the
    * static value only seeds the initial plan.
    */
  val DefaultShufflePartitions = 32

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = DefaultShufflePartitions,
      appName: String = "graft"
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Arithmetic overflow WRAPS (two's complement) instead of throwing:
      // pinned to match the reference's i32 semantics (reference:
      // tests/test_native_execution.py:13-26 asserts MAX_INT+MAX_INT==-2);
      // Spark 4 defaults ANSI on, which would throw — SURVEY §7.1.3.
      .config("spark.sql.ansi.enabled", "false")
      // AQE: runtime re-planning (partition coalescing, skew-join split,
      // dynamic broadcast) — essential at 100 TB where static stats lie.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Keep file splits bounded so one task never owns an unbounded
      // byte range (analog of the reference's one-job-per-2M-row-block
      // scan granularity, reference: src/mini_spark/plan.py:90-93).
      .config("spark.sql.files.maxPartitionBytes", "128m")
      // openCost floors the split size at max(openCost, bytes/cores): the
      // 4 MB default leaves a 10 MB table on 3 of 32 cores. Footer opens
      // on local/NVMe storage are cheap, so floor at 256 KB — split size
      // then tracks bytes-per-core for small inputs while the 128 MB
      // maxPartitionBytes cap still governs at cluster scale (where
      // bytes-per-core is huge), so this ONLY widens small-scan fan-out.
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // Write timestamps as INT64 micros, not legacy INT96: INT96 has
      // no usable column statistics, which silently disables BOTH
      // parquet row-group pruning and the Versioned manifest-level
      // data skipping on every timestamp predicate. Micros is also
      // what the test corpus (pyarrow) and DuckDB speak natively.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // test data's events table stores nanosecond timestamps
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
