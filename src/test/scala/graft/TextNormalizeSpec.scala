package graft

import org.apache.spark.sql.functions._

import graft.functions.{ColumnBridge, NormalizeText}

/** Every non-ASCII / control codepoint is spelled as a source escape
  * so the intent (composed vs decomposed) is visible and tooling
  * normalization can never silently rewrite a fixture. */
class TextNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val eAcute = "\u00E9" // composed e-acute
  private val aRing = "\u00C5" // composed A-ring

  private def norm(s: String): String = {
    val df = Seq(Tuple1(s)).toDF("t")
      .select(ColumnBridge.col(NormalizeText(ColumnBridge.expr(col("t"))))
        .as("n"))
    df.as[String].head()
  }

  test("NFC composes decomposed accents and compatibility codepoints") {
    assert(norm("Cafe\u0301") === "Caf" + eAcute) // e + combining acute
    assert(norm("A\u030A") === aRing) // A + combining ring
    // U+212B ANGSTROM SIGN canonically maps to U+00C5 under NFC
    assert(norm("\u212B") === aRing)
    // already-composed input is unchanged
    assert(norm("Caf" + eAcute) === "Caf" + eAcute)
  }

  test("controls stripped, tab/newline/cr treated as whitespace") {
    assert(norm("a\u0007b") === "ab") // BEL
    assert(norm("a\u0000b") === "ab") // NUL
    assert(norm("a\u000Bb") === "ab") // VT is a control here, not space
    assert(norm("a\u007Fb") === "ab") // DEL
    assert(norm("a\tb\nc\rd") === "a b c d")
    assert(norm("a \t \n b") === "a b")
  }

  test("whitespace collapsed and space-trimmed; NBSP preserved") {
    assert(norm("  a   b  ") === "a b")
    assert(norm("a\u00A0b") === "a\u00A0b") // NBSP is not in the class
    assert(norm("") === "")
    assert(norm("   ") === "")
    assert(norm("\t\n") === "")
  }

  test("pure-ASCII text is untouched beyond whitespace rules") {
    assert(norm("The quick brown fox.") === "The quick brown fox.")
  }

  test("null in, null out") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(ColumnBridge.col(NormalizeText(ColumnBridge.expr(col("t"))))
        .as("n"))
    assert(df.collect().head.isNullAt(0))
  }
}
