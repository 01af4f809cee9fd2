package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** First-fit-decreasing (FFD) bin assignment as ONE native expression:
  * given per-document token counts ALREADY SORTED DESCENDING (callers
  * sort; the decreasing order is what gives FFD its 11/9·OPT+1 packing
  * guarantee), place each document in the FIRST open bin it fits, else
  * open a new bin. Returns the 0-based bin of each input position.
  *
  * Next-fit ([[NextFitBinsExpr]]) closes a bin forever on overflow —
  * one (bin, acc) register, streamable, but a small doc arriving after
  * a big one wastes the earlier bins' headroom. FFD revisits every open
  * bin, so fills pack tighter (fewer bins → less padding) at the cost
  * of keeping all open-bin fills in memory and requiring the full
  * shard up front — the batch-curation trade, not the ingest one.
  *
  * Cost is O(n · bins) per shard via a linear first-fit scan; bins ≤ n
  * and shards are bounded by construction (the
  * [[graft.operators.Pack.nextFitPack]] sharding argument). An
  * oversized document (> budget) occupies a bin alone — placed like
  * any other: it fits no open bin, so it opens one.
  */
case class FfdBinsExpr(child: Expression, budget: Long)
    extends UnaryExpression {

  require(budget >= 1, s"budget must be positive, got $budget")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ffd_bins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ffd_bins expects array<bigint> token counts; got $other")
  }

  def bins(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    val fills = new java.util.ArrayList[java.lang.Long](16)
    var prev = Long.MaxValue
    var i = 0
    while (i < n) {
      val ntok = arr.getLong(i)
      if (ntok < 0) throw new IllegalArgumentException(
        s"ffd_bins: negative token count $ntok at $i")
      if (ntok > prev) throw new IllegalArgumentException(
        "ffd_bins: input must be sorted descending (position " + i +
          s" has $ntok after $prev) — the decreasing order is the " +
          "algorithm's approximation guarantee, not a convention")
      prev = ntok
      var b = 0
      while (b < fills.size && fills.get(b) + ntok > budget) b += 1
      if (b == fills.size) fills.add(ntok)
      else fills.set(b, fills.get(b) + ntok)
      out(i) = b
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = bins(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ffdBins", this, classOf[FfdBinsExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.bins($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): FfdBinsExpr =
    copy(child = newChild)
}
