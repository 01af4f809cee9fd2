package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ asymmetric-distance computation over a code array: dist =
  * Σ_s lut(s)(codes(s)), accumulated in ascending subspace order —
  * bit-identical to the composable `element_at` chain and to the DuckDB
  * oracle's fixed l0+l1+... sum.
  *
  * Exists for the same reason as [[PqCodesExpr]]: the composable route
  * needs a `let` binding (a higher-order `aggregate`, which is
  * CodegenFallback) to reference the code array m times without
  * re-encoding — this expression consumes the codes child ONCE, so the
  * whole scan projection stays inside WholeStageCodegen. The LUT is
  * expression state (m·k doubles), shipped once per stage.
  *
  * An out-of-range code raises (ArrayIndexOutOfBounds) rather than
  * returning a garbage distance.
  */
case class PqAdcExpr(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects array<int> PQ codes; got $other")
  }

  def dist(codes: ArrayData): Double = {
    if (codes == null)
      throw new IllegalArgumentException(
        "pq_adc: null code array (the engine's corpus is null-free; " +
        "filter upstream)")
    if (codes.numElements() != lut.length)
      throw new IllegalArgumentException(
        s"pq_adc: ${codes.numElements()} codes for ${lut.length} subspaces")
    var acc = 0.0
    var s = 0
    while (s < lut.length) {
      // a null slot would read as code 0 from unsafe rows — silently
      // summing the wrong LUT cell; be loud (out-of-range codes already
      // raise via the array bounds check)
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(s"pq_adc: null code at subspace $s")
      acc += lut(s)(codes.getInt(s))
      s += 1
    }
    acc
  }

  // null input must FAIL, not yield a null distance that ranks first in
  // ascending top-k — same stance as PqCodesExpr
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    dist(child.eval(input).asInstanceOf[ArrayData])

  override def nullable: Boolean = false

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = $ref.dist(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
}
