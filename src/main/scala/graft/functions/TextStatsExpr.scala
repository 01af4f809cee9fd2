package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics as one native expression.
  *
  * The composable route ([[graft.operators.TextAnalysis]]) evaluates four
  * regex/array pipelines per row, and Spark's higher-order array
  * functions run interpreted even inside whole-stage codegen. This
  * expression computes all four counters in ONE character walk with no
  * regex and no array materialization; `doGenCode` emits a single static
  * call, so the row stays inside the codegen'd loop.
  *
  * Semantics mirror the composable definitions exactly (same whitespace
  * class as Java's `\s`, same `[a-z0-9]` subword runs over the lowered
  * text, same `[.,!?;:]` punctuation class, same stopword list), so the
  * same DuckDB oracle gates both implementations.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false)))

  private val stopwords = new java.util.HashSet[String](
    java.util.Arrays.asList(
      graft.operators.TextAnalysis.Stopwords: _*))

  // regex \s character class (Java): [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'

  /** Two allocation-free walks (raw string for tokens/punct, lowered
    * string for subwords/stopwords); called from generated code (static
    * forwarder of this companion).
    *
    * Lowering happens ONCE via `UTF8String.toLowerCase`: the EXACT
    * routine `F.lower` executes (ASCII fast path, same slow path for
    * non-ASCII), so this expression and the composable twin can never
    * diverge on any input or JVM locale — per-char `Character.toLowerCase`
    * or a `String.toLowerCase` with a different locale choice would
    * (Turkish dotless-ı, İ → i+combining-dot). Subword/stopword
    * boundaries are found on the lowered string itself, exactly like
    * `split(lower(text), ...)`. */
  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    var nTokens = 0
    var nPunct = 0
    locally {
      val n = s.length
      var i = 0
      var inToken = false
      while (i < n) {
        val c = s.charAt(i)
        if (isPunct(c)) nPunct += 1
        if (!isWs(c)) { if (!inToken) { inToken = true; nTokens += 1 } }
        else inToken = false
        i += 1
      }
    }
    val ls = input.toLowerCase.toString
    var nSub = 0
    var nStop = 0
    locally {
      val n = ls.length
      var i = 0
      var inToken = false
      var inSub = false
      var tokenStart = -1
      while (i < n) {
        val c = ls.charAt(i)
        if (!isWs(c)) {
          if (!inToken) { inToken = true; tokenStart = i }
        } else if (inToken) {
          inToken = false
          if (stopwords.contains(ls.substring(tokenStart, i))) nStop += 1
        }
        val isAl = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (isAl && !inSub) { inSub = true; nSub += 1 }
        else if (!isAl) inSub = false
        i += 1
      }
      if (inToken && stopwords.contains(ls.substring(tokenStart, n))) nStop += 1
    }
    new GenericInternalRow(Array[Any](nTokens, nSub, nPunct, nStop))
  }
}
