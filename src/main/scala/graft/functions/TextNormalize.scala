package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus text canonicalization for dedup keys and training text: strip
  * C0 control characters (except \t \n \r, which are whitespace), NFC
  * Unicode normalization (composes decomposed accents so `e`+U+0301 and
  * `é` fingerprint identically), collapse whitespace runs to one space,
  * trim. Exactly this pipeline, in exactly this order, is mirrored by
  * the DuckDB oracle (`nfc_normalize` + the same regex classes — the
  * classes are spelled explicitly because Java's `\s` and RE2's `\s`
  * disagree on \x0B). A native expression rather than a chain of four
  * built-in calls so the hot path makes one pass over each string with
  * two precompiled patterns and stays inside whole-stage codegen via
  * [[UnaryEvalCodegen]]; NFC is skipped entirely for pure-ASCII input
  * (the overwhelmingly common case in a web corpus — ASCII is
  * NFC-invariant by definition). */
case class NormalizeText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnaryEvalCodegen {

  override def dataType: DataType = StringType
  override protected def castResult(x: String): String =
    s"(org.apache.spark.unsafe.types.UTF8String) $x"

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    s = NormalizeText.Controls.matcher(s).replaceAll("")
    if (!NormalizeText.isAscii(s) && !Normalizer.isNormalized(s, Normalizer.Form.NFC))
      s = Normalizer.normalize(s, Normalizer.Form.NFC)
    s = NormalizeText.Spaces.matcher(s).replaceAll(" ")
    UTF8String.fromString(NormalizeText.trimSpaces(s))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** C0 controls minus \t(09) \n(0A) \r(0D), plus DEL. */
  private[functions] val Controls =
    Pattern.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
  /** Space-class collapsed to one space; spelled out (not \s) so the
    * oracle's RE2 class is character-for-character identical. */
  private[functions] val Spaces = Pattern.compile("[ \\t\\n\\r]+")

  private[functions] def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** Trim ASCII space only (after collapse every whitespace run IS a
    * single space) — matches DuckDB `trim()`'s space-only default,
    * where Java's `String.trim` would also strip <= U+0020 controls. */
  private[functions] def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }
}
