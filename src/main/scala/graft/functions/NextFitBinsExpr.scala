package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Next-fit whole-document bin assignment as ONE native expression:
  * given per-document token counts in packing order, return the 0-based
  * bin index of each document under the rule "open a new bin when the
  * running total would exceed `budget` (a document larger than the
  * budget occupies a bin alone)".
  *
  * This is the packing variant [[graft.operators.Pack.concatChunk]]
  * deliberately is NOT: concat-and-chunk splits documents across
  * context windows (pre-training); next-fit keeps every document whole
  * (SFT/eval examples, where a straddled document is a corrupted one)
  * and pays padding instead. The fold is inherently sequential per
  * shard — a composable `aggregate(...)` HOF threading an `out` array
  * through `array_append` copies the array per element (O(n²) per
  * shard); here it is one linear pass that stays inside
  * WholeStageCodegen (the [[CdcBoundsExpr]] rationale).
  */
case class NextFitBinsExpr(child: Expression, budget: Long)
    extends UnaryExpression {

  require(budget >= 1, s"budget must be positive, got $budget")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "next_fit_bins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"next_fit_bins expects array<bigint> token counts; got $other")
  }

  def bins(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var bin = 0
    var acc = 0L
    var i = 0
    while (i < n) {
      val ntok = arr.getLong(i)
      if (ntok < 0) throw new IllegalArgumentException(
        s"next_fit_bins: negative token count $ntok at $i")
      if (acc > 0 && acc + ntok > budget) { bin += 1; acc = ntok }
      else acc += ntok
      out(i) = bin
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = bins(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nextFit", this, classOf[NextFitBinsExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.bins($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NextFitBinsExpr =
    copy(child = newChild)
}
