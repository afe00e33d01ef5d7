package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for the curation pipeline, as one native
  * codegen'd expression instead of a Scala UDF or a regexp+UDF chain:
  *
  *  1. strip zero-width characters (U+200B–U+200D, U+FEFF) and control
  *     characters (C0 except \t \n \r, DEL, C1) — the invisible bytes
  *     that defeat exact/near dedup and token counting;
  *  2. Unicode NFC normalization (java.text.Normalizer) so composed and
  *     decomposed spellings of the same grapheme hash identically;
  *  3. SIMPLE case folding — `Character.toLowerCase` per code point, the
  *     context-free 1:1 UnicodeData mapping. Deliberately NOT
  *     `String.toLowerCase`, whose locale-sensitive contextual rules
  *     (final sigma, Turkish dotted I) diverge from the simple mapping
  *     other engines' `lower` implements (DuckDB/utf8proc) — the
  *     cross-engine oracle pins this choice.
  *
  * Order matters and is part of the contract: strip → NFC → fold. A
  * zero-width char between base and combining mark would block NFC
  * composition, so the strip runs first; folding runs last so it sees
  * composed characters.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    NormalizeText.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NormalizeText.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  private def stripped(cp: Int): Boolean =
    (cp < 0x20 && cp != '\t' && cp != '\n' && cp != '\r') ||
      cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
      (cp >= 0x200B && cp <= 0x200D) || cp == 0xFEFF

  def normalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    val keep = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      if (!stripped(cp)) keep.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val nfc = java.text.Normalizer.normalize(keep, java.text.Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(nfc.length)
    i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      out.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
