package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The text-normalization kernel behind `text_normalize(str)` — the
  * canonicalization pass a pipeline runs BEFORE hashing/dedup so that
  * byte-different spellings of the same content (decomposed vs composed
  * accents, tab vs space runs) collapse to one form:
  *
  *   1. Unicode NFC (canonical composition — `e` + U+0301 becomes `é`);
  *   2. runs of the 5-char ASCII whitespace class `[ \t\n\x0b\f\r]`
  *      (the tokenizer's class, RE2-compatible) collapse to ONE space;
  *   3. leading/trailing whitespace is dropped.
  *
  * Both steps are engine-portable: DuckDB replays them as
  * `trim(regexp_replace(nfc_normalize(s), '[ \t\n\x0b\f\r]+', ' ', 'g'))`
  * byte-for-byte (NFC is a Unicode-standard function, not a library
  * heuristic). Deliberately NO case folding: lowercasing is
  * locale-sensitive (dotless-i) and belongs to the tokenizer's policy,
  * not canonicalization. */
object NormalizeText {
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == 0x0b.toChar ||
          c == '\f' || c == '\r') {
        pendingSpace = true
      } else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `text_normalize(str)` — codegen'd (one static call, no UDF
  * serialization); registered by [[GraftExtensions]]. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
