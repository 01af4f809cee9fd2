package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash: tokenize + hash + vote + fold in one pass.
  *
  * The composable twin ([[graft.operators.Dedup.simhash64]]) folds a
  * 64-slot vote array through interpreted higher-order functions,
  * allocating per token; this expression walks the lowered UTF-8 bytes
  * once with a stack vote array and zero per-token allocation on the
  * xxhash64 path. Bit-identical to the composable twin by construction
  * (same lowering, same token boundaries, same hashes) — the parity spec
  * asserts it, so either implementation satisfies the same oracle.
  *
  * `portable = true` switches the token hash from xxhash64(seed 42) to
  * the first 60 bits of md5 ([[graft.operators.Dedup.md5Hash60]]
  * semantics), the engine-portable variant a differential SQL oracle can
  * replay.
  */
case class SimHashExpr(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashExpr.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {

  // the \s class over UTF-8 bytes: multi-byte codepoints never contain
  // ASCII bytes, so byte-walking is exact
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Replicates `TextAnalysis.tokens(lower(text))` exactly: tokens are
    * maximal non-whitespace runs (never empty). Each token hash votes ±1
    * per bit; sign of the totals is the signature. Called from generated
    * code. */
  def compute(input: UTF8String, portable: Boolean): Long = {
    val bytes = input.toLowerCase.getBytes
    val start = 0
    val end = bytes.length

    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    def hashSlice(off: Int, len: Int): Long =
      if (portable) PortableHash.md5Hash60(bytes, off, len)
      else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, 42L)

    var i = start
    while (i < end) {
      while (i < end && isWs(bytes(i))) i += 1
      if (i < end) {
        val tokStart = i
        while (i < end && !isWs(bytes(i))) i += 1
        vote(hashSlice(tokStart, i - tokStart))
      }
    }

    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
