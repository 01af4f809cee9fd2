package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram minhash → LSH band keys, one pass.
  *
  * Computes exactly what [[graft.operators.Dedup.minhashBandKeys]]
  * (shingleN = 1) computes — md5-60 base hash per token, affine rehash
  * minima mod 2^31-1, per-band comma-joined keys — but in primitive long
  * arithmetic with zero boxing. The interpreted fold costs ~7.5 ms/doc
  * (per-token 32-lane `zip_with` allocates an array of boxed longs each
  * step); this walk is ~100× cheaper, which is the difference between the
  * LSH banding stage being free and being the pipeline bottleneck.
  *
  * Distinctness of shingles is irrelevant to minima (min over a multiset
  * equals min over its set), so tokens are folded directly — another
  * reason the unigram path needs no array materialization at all. The
  * parity spec asserts bit-equality with the composable route.
  */
case class MinhashBandsExpr(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinhashBandsExpr.compute(input.asInstanceOf[UTF8String], numBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashBandsExpr.compute($c, $numBands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBandsExpr {

  private val P = graft.operators.Dedup.MinhashP

  private val paramCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def params(numHashes: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(numHashes, n => {
      val ps = graft.operators.Dedup.minhashAffineParams(n)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Called from generated code. */
  def compute(input: UTF8String, numBands: Int, rowsPerBand: Int): GenericArrayData = {
    val numHashes = numBands * rowsPerBand
    val (as, bs) = params(numHashes)
    val bytes = input.toLowerCase.getBytes
    val n = bytes.length
    val mins = Array.fill(numHashes)(P)

    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val tokStart = i
        while (i < n && !isWs(bytes(i))) i += 1
        val base = PortableHash.md5Hash60(bytes, tokStart, i - tokStart) % P
        var k = 0
        while (k < numHashes) {
          val h = (as(k) * base + bs(k)) % P
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
    }

    val bands = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(rowsPerBand * 11)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      bands(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(bands)
  }
}
