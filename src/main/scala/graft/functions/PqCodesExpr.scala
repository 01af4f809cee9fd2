package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as ONE native expression.
  *
  * The composable formulation (per subspace: `least` over k
  * `struct(sqDist, i)` where each sqDist is a `zip_with`+`aggregate`
  * fold) builds an expression tree of several thousand nodes for
  * realistic (m, k) — past Spark's codegen thresholds, so the whole
  * projection drops out of WholeStageCodegen and every row is encoded by
  * interpreted eval. This class is the tight triple loop instead: the
  * projection stays inside codegen (the generated code calls
  * [[encode]] on a reference object), and the arithmetic — j-ascending
  * accumulation, strictly-less argmin keeping the first index — is
  * bit-identical to the composable fold and to the DuckDB oracle replay.
  *
  * Codebooks live in constructor state, not child literals: same
  * rationale as [[BloomProbeExpr]] — plan processing cost must not scale
  * with m·k·subdim, and the arrays ship once per stage in the broadcast
  * task binary.
  */
case class PqCodesExpr(child: Expression,
                       codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  private val m = codebooks.length
  private val subdim = codebooks(0)(0).length
  private val dim = m * subdim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<double> (cast upstream); got $other")
  }

  def encode(arr: ArrayData): ArrayData = {
    if (arr == null)
      throw new IllegalArgumentException(
        "pq_codes: null input vector (the engine's corpus is null-free; " +
        "filter upstream)")
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_codes: vector of length ${arr.numElements()} does not match " +
        s"m*subdim = $dim")
    // a null element would read as 0.0 from unsafe rows — a plausible
    // garbage code; the composable twin nulls out instead. Be LOUD.
    var e = 0
    while (e < dim) {
      if (arr.isNullAt(e))
        throw new IllegalArgumentException(
          s"pq_codes: null element at position $e")
      e += 1
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * subdim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val code = cb(c)
        var d = 0.0
        var j = 0
        while (j < subdim) {
          val t = arr.getDouble(base + j) - code(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest c
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  // a null vector must FAIL, not propagate: a null distance would rank
  // first in ascending top-k — the silent-garbage mode this expression
  // family exists to prevent. encode(null) throws, so bypass the
  // null-short-circuiting eval/codegen paths.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    encode(child.eval(input).asInstanceOf[ArrayData])

  override def nullable: Boolean = false

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodesExpr].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.encode(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}
