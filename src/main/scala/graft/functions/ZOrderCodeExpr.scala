package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Morton (Z-order) code over k numeric columns — the clustering key the
  * lakehouse `OPTIMIZE ... ZORDER BY` statement sorts by.
  *
  * Each input value is rank-quantized to a `bitsPerCol`-bit bucket code by
  * binary search over that column's quantile `boundaries` (a small
  * driver-computed array — `(1 << bitsPerCol) - 1` cutpoints per column,
  * carried as a constructor field like [[BloomProbeExpr]]'s sketch so plan
  * processing never byte-compares it), then the codes are bit-interleaved
  * MSB-first across columns. Rows close in the resulting 1-D order are
  * close in EVERY clustered dimension, so parquet row-group min/max
  * statistics become selective on all of them at once — the property a
  * linear sort only provides for its leading column.
  *
  * Quantile (not min/max linear) quantization is what makes the curve
  * skew-proof: a power-law column maps to near-uniform bucket codes, so
  * no z-range collapses onto one hot bucket. NULL quantizes to bucket 0
  * (clustered together, first in the order); the code itself is never
  * NULL.
  */
case class ZOrderCodeExpr(boundaries: Array[Array[Double]],
                          children: Seq[Expression]) extends Expression {

  require(boundaries.length == children.length,
    s"zorder_code: ${boundaries.length} boundary sets for " +
      s"${children.length} columns")

  private val bitsPerCol: Int =
    if (children.isEmpty) 0 else math.min(8, 63 / children.length)

  require(boundaries.forall(_.length == (1 << bitsPerCol) - 1),
    s"zorder_code: each boundary set must hold ${(1 << bitsPerCol) - 1} " +
      s"cutpoints (${bitsPerCol} bits/column at ${children.length} columns)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_code"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        "zorder_code needs at least 2 columns — one column is a plain sort")
    else if (children.size > 7)
      TypeCheckResult.TypeCheckFailure(
        "zorder_code supports at most 7 columns (63 interleaved bits)")
    else children.find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder_code children must be DOUBLE (cast first); got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Bucket of `v` in column `i`: count of cutpoints <= v, by binary
    * search (insertion point over ascending boundaries). Ties collapse
    * duplicate cutpoints of a low-cardinality column into one bucket —
    * harmless, the interleave only needs monotonicity. */
  def bucketOf(i: Int, v: Double): Int = {
    val b = boundaries(i)
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the per-column codes MSB-first: bit (bitsPerCol-1) of
    * every column, then the next bit of every column, … — the Morton
    * order that gives each prefix of the result equal resolution in
    * every dimension. */
  def interleave(codes: Array[Int]): Long = {
    var z = 0L
    var b = bitsPerCol - 1
    while (b >= 0) {
      var i = 0
      while (i < codes.length) {
        z = (z << 1) | ((codes(i) >>> b) & 1)
        i += 1
      }
      b -= 1
    }
    z
  }

  def codeOf(vals: Array[Double], nulls: Array[Boolean]): Long = {
    val codes = new Array[Int](vals.length)
    var i = 0
    while (i < vals.length) {
      codes(i) = if (nulls(i)) 0 else bucketOf(i, vals(i))
      i += 1
    }
    interleave(codes)
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Double](children.length)
    val nulls = new Array[Boolean](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) nulls(i) = true
      else vals(i) = v.asInstanceOf[Double]
      i += 1
    }
    codeOf(vals, nulls)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zorder", this, classOf[ZOrderCodeExpr].getName)
    val vals = ctx.freshName("zVals")
    val nulls = ctx.freshName("zNulls")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""
        ${e.code}
        if (${e.isNull}) { $nulls[$i] = true; }
        else { $vals[$i] = ${e.value}; }"""
    }.reduce(_ + _)
    ev.copy(
      code = code"""
        double[] $vals = new double[${children.length}];
        boolean[] $nulls = new boolean[${children.length}];
        $fill
        long ${ev.value} = $ref.codeOf($vals, $nulls);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCodeExpr =
    copy(children = newChildren)
}
