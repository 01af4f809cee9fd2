package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** The one `org.apache.spark.sql`-package shim this library needs: a
  * v1 streaming [[org.apache.spark.sql.execution.streaming.Source]]'s
  * `getBatch` must return a frame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * way to stamp an arbitrary batch plan with that flag is
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)` —
  * `private[sql]`, hence this object's package. This is exactly how
  * Spark's own `FileStreamSource.getBatch` builds its frames
  * (sql/core FileStreamSource: `internalCreateDataFrame(qe.toRdd,
  * schema, isStreaming = true)`). */
object StreamingShim {

  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }
}
