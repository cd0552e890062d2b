package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization — the first pass of every training
  * corpus pipeline, and one Spark has NO builtin for (there is no NFC
  * function in org.apache.spark.sql.functions). One codegen'd kernel:
  *
  *  1. Unicode NFC normalization (java.text.Normalizer — combining
  *     sequences compose, e.g. `e` + U+0301 → `é`), so byte-different
  *     encodings of the same text hash/dedup identically downstream;
  *  2. ISO control characters stripped (C0+C1 except the whitespace
  *     four), with NO space inserted;
  *  3. whitespace runs collapsed to one space, leading/trailing
  *     whitespace dropped.
  *
  * PORTABILITY CONTRACT (what makes this oracle-checkable): the
  * whitespace class is EXACTLY {space, \t, \n, \f, \r} — the RE2 `\s`
  * set both engines agree on — NOT Java's Character.isWhitespace
  * (which adds vertical tab, the file-separator controls, and some
  * unicode spaces; those fall into the stripped-control or
  * pass-through classes instead). The DuckDB replay is
  * `trim(regexp_replace(regexp_replace(nfc_normalize(x),
  * '[c0/c1 minus ws]', '', 'g'), '[ \t\n\f\r]+', ' ', 'g'))` —
  * equal on ALL inputs by construction, not just on the test corpus.
  */
object TextNorm {

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'

  /** Static kernel — called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isWs(cp)) {
        // collapse; a run before the first visible char is a left-trim
        pendingSpace = started
      } else if (Character.isISOControl(cp)) {
        // stripped, no space inserted, pending state untouched
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(cp)
        started = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def textNorm(c: Column): Column =
    Bridge.column(NfcNormExpr(Bridge.expression(c)))
}

case class NfcNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any): Any =
    TextNorm.normalize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNorm.normalize($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
