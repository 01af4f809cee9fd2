package graft.trace

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage execution trace, the Spark-native analog of the reference's
  * merged perfetto worker traces (reference: src/mini_spark/utils.py:85-169,
  * execution.py:194-195): at 100 TB the per-stage wall-time / task-count /
  * shuffle-byte breakdown is how you find the straggler stage.
  *
  * Register on the SparkContext, then [[drain]] after each query to get
  * the stages it ran. All numbers come from the driver's aggregated
  * [[org.apache.spark.executor.TaskMetrics]], so this adds zero overhead
  * to the executors (the scheduler already collects them).
  */
final class StageTraceListener extends SparkListener {

  /** One completed stage: wall-clock from first task launch to stage
    * completion, total executor cpu-run time across tasks, and IO volumes. */
  final case class StageRec(
      stageId: Int,
      name: String,
      numTasks: Int,
      wallMs: Long,
      executorRunMs: Long,
      inputBytes: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long) {
    def toJson: String = {
      // stage names embed plan text; keep only the first line / 80 chars
      val clean = name.takeWhile(_ != '\n').take(80)
        .replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"stage":$stageId,"name":"$clean","tasks":$numTasks,""" +
        s""""wall_ms":$wallMs,"executor_run_ms":$executorRunMs,""" +
        s""""input_bytes":$inputBytes,"shuffle_read_bytes":$shuffleReadBytes,""" +
        s""""shuffle_write_bytes":$shuffleWriteBytes}"""
    }
  }

  private val completed = mutable.ArrayBuffer.empty[StageRec]

  override def onStageCompleted(event: SparkListenerStageCompleted): Unit = {
    val info = event.stageInfo
    val m = info.taskMetrics
    val wall = (for {
      s <- info.submissionTime
      c <- info.completionTime
    } yield c - s).getOrElse(0L)
    val rec = StageRec(
      stageId = info.stageId,
      name = info.name,
      numTasks = info.numTasks,
      wallMs = wall,
      executorRunMs = if (m == null) 0L else m.executorRunTime,
      inputBytes = if (m == null) 0L else m.inputMetrics.bytesRead,
      shuffleReadBytes =
        if (m == null) 0L
        else m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead,
      shuffleWriteBytes = if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten)
    completed.synchronized { completed += rec }
  }

  /** Return all stages completed since the last drain, and clear them.
    * Call between queries to attribute stages to the query that ran. */
  def drain(): Seq[StageRec] = completed.synchronized {
    val out = completed.toList
    completed.clear()
    out
  }
}
