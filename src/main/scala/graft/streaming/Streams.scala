package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Structured-streaming surface of the engine.
  *
  * The reference has no streaming at all (SURVEY §2.5); this is the
  * engine's scale-path extension for continuous ingestion: file-source
  * streams over the same parquet layout, watermarked tumbling-window
  * aggregation, and an idempotent parquet sink. The batch twins of these
  * transforms (see [[windowedCounts]]) run in the correctness gate; the
  * streaming wrapper reuses the identical expression tree, which is the
  * point — one logical plan, micro-batched by the engine.
  */
object Streams {

  /** Tumbling-window event aggregation — the transform, usable on either
    * a batch or a streaming DataFrame (identical semantics; Spark plans
    * stateful windows when the input is streaming). */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(F.window(F.col("ts"), windowLength), F.col("event_type"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.round(F.sum("value"), 4).as("sum_value"))
      .select(
        F.col("window.start").as("window_start"),
        F.col("event_type"), F.col("n_events"), F.col("sum_value"))

  /** Open a file-source stream over a parquet directory (schema must be
    * supplied for streaming reads; reuse the batch footer schema). */
  def readParquetStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Write an aggregated stream to parquet with checkpointing (exactly-
    * once per micro-batch via the commit log). */
  def toParquetSink(df: DataFrame, outPath: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
}
