package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries as ONE native expression: the
  * 1-based end positions (ascending, final position always included) of
  * `Pack.cdcChunks`' boundary rule — position `i ≥ k` is a boundary when
  * `md5Hash60(join(toks[i-k+1..i], " ")) % modulus == 0`.
  *
  * The composable formulation evaluates a per-position
  * `slice → array_join → md5` chain inside higher-order filters — all
  * CodegenFallback, with a joined-string allocation per position. Here
  * the gram hash streams through incremental digest updates
  * ([[PortableHash.md5Hash60Join]] — byte-identical to hashing the
  * joined string) in a tight loop, and the projection stays inside
  * WholeStageCodegen. Values match the composable route and the DuckDB
  * replay oracle exactly.
  */
case class CdcBoundsExpr(child: Expression, k: Int, modulus: Int)
    extends UnaryExpression {

  require(k >= 1 && modulus >= 1,
    s"k and modulus must be positive, got k=$k modulus=$modulus")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects array<string> tokens; got $other")
  }

  def bounds(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i)
      // tokens() can't produce nulls, but direct SQL callers can; a null
      // would NPE mid-digest — divergent from array_join's skip-nulls.
      // Be loud instead (null-free engine contract).
      if (toks(i) == null)
        throw new IllegalArgumentException(s"cdc_bounds: null token at $i")
      i += 1
    }
    val out = new java.util.ArrayList[Integer](8)
    var pos = k // 1-based end position of the first full gram
    while (pos <= n) {
      if (PortableHash.md5Hash60Join(toks, pos - k, k) % modulus == 0)
        out.add(pos)
      pos += 1
    }
    // forced end-of-doc, deduplicated like array_union
    if (out.isEmpty || out.get(out.size - 1) != n) out.add(n)
    val res = new Array[Int](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(v: Any): Any = bounds(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBounds", this, classOf[CdcBoundsExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.bounds($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundsExpr =
    copy(child = newChild)
}
