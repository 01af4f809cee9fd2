package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Literal}
import org.apache.spark.sql.types._

/** A constant that evaluates exactly like `Literal(value, dataType)`
  * but rides the generated code's REFERENCES ARRAY instead of being
  * inlined into the source text.
  *
  * Why that matters: Spark's whole-stage-codegen cache is keyed on the
  * generated source, and [[Literal.doGenCode]] inlines primitive values
  * verbatim (`input >= 412365L`) — so a statement template executed
  * repeatedly with different constants (the CDC replication apply's
  * per-delta MERGE key bounds) generates a DIFFERENT source text every
  * time, misses the cache, and pays a fresh Janino compile plus the JVM
  * JIT of the new classes on every statement. The round-16 forensics
  * metered that tax at 1–2.7 s of JIT wall per MERGE — the dominant
  * fixed cost of a frequent-small-delta replication consumer (verdict
  * ask #3). With the value read from `references[i]` the source text is
  * identical across statements, the cached generated class is reused,
  * and the JIT is paid once per template, not once per statement.
  *
  * Deliberately NOT foldable: ConstantFolding would collapse it back
  * into an inlined [[Literal]], and [[org.apache.spark.sql.execution
  * .datasources.DataSourceStrategy]] would still translate a folded
  * comparison into a pushable source filter — exactly the inlining this
  * expression exists to avoid. The trade is explicit:
  *   - MANIFEST segment skipping is PRESERVED — [[graft.sources
  *     .SegmentStats]] evaluates `col <op> StableConst` (and the
  *     type-coercion `Cast` around it) driver-side like a literal;
  *   - parquet ROW-GROUP pruning on such a conjunct is forfeited
  *     (`translateFilter` needs a [[Literal]]) — callers use it for
  *     REDUNDANT bounds whose pruning value lives at the segment level
  *     (the apply's key bounds are implied by the equi-join keys).
  *
  * `value` is the CATALYST-internal representation (UTF8String for
  * strings, Long for timestamps) — the same contract as [[Literal]].
  */
case class StableConst(value: Any, dataType: DataType)
    extends LeafExpression {

  override def nullable: Boolean = value == null
  override def foldable: Boolean = false
  override def prettyName: String = "stable_const"

  override def eval(input: InternalRow): Any = value

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (value == null) {
      ExprCode.forNullValue(dataType)
    } else {
      // the value enters through references[...] — identical generated
      // text for every instance of the same (dataType, null-ness) shape
      val ref = ctx.addReferenceObj("stableConst", value,
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .boxedType(dataType))
      val unboxed = dataType match {
        case BooleanType => s"$ref.booleanValue()"
        case ByteType => s"$ref.byteValue()"
        case ShortType => s"$ref.shortValue()"
        case IntegerType | DateType => s"$ref.intValue()"
        case LongType | TimestampType | TimestampNTZType =>
          s"$ref.longValue()"
        case FloatType => s"$ref.floatValue()"
        case DoubleType => s"$ref.doubleValue()"
        case _ => ref
      }
      val javaType = org.apache.spark.sql.catalyst.expressions.codegen
        .CodeGenerator.javaType(dataType)
      ev.copy(
        code = code"final $javaType ${ev.value} = $unboxed;",
        isNull = FalseLiteral)
    }
  }

  /** The equivalent inlined literal — what driver-side consumers
    * (segment-stats skipping) evaluate against. */
  def toLiteral: Literal = Literal(value, dataType)
}
