package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED distinct long arrays via a
  * two-pointer merge — no per-pair hash-set construction, no boxing.
  * `array_intersect` builds an OpenHashSet of boxed values for every
  * pair; on an LSH verification path evaluating millions of candidate
  * pairs that allocation dominates. Sorting is done once per document
  * upstream (`array_sort` at shingle-preparation time), amortized across
  * every pair the document participates in.
  *
  * Returns |a ∩ b| / |a ∪ b| with the 1.0-on-two-empties convention of
  * [[graft.operators.Dedup.jaccard]]. Inputs MUST be sorted ascending
  * and duplicate-free; the caller owns that invariant.
  */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSortedExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardSortedExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSortedExpr {
  /** Two-pointer sorted-set intersection; static forwarder is called
    * from generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    inter.toDouble / union
  }
}
