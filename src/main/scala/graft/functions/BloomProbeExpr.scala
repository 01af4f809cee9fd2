package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch membership probe with the sketch carried as a
  * CONSTRUCTOR FIELD, not a child `Literal`.
  *
  * The placement is the point. A multi-MB sketch embedded as a literal
  * makes every tree traversal that touches the filter O(sketch size):
  * Catalyst copies, canonicalizes, and equality-compares literal values
  * through every analyzer/optimizer batch (`Literal.equals` is a full
  * byte-array compare), which measured ~1.6 s of pure driver time for a
  * 4 MB sketch on an otherwise sub-second query. A constructor field of
  * type `Array[Byte]` compares by reference in the generated case-class
  * equality, so plan processing cost is independent of sketch size; the
  * bytes still ship to executors exactly once per stage inside the
  * broadcast task binary, like any expression state.
  *
  * The filter is deserialized lazily once per JVM/deserialized instance
  * and probed via [[mightContain]] from both the interpreted path and
  * the generated code (`addReferenceObj` on the expression itself — the
  * same pattern Spark's own runtime-filter probe uses).
  */
case class BloomProbeExpr(sketch: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain probes 64-bit hashes; got ${child.dataType}")

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(sketch)

  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}
