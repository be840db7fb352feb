package graft

import org.apache.spark.sql.functions._

import graft.operators.PiiRedact

/** PiiRedact rule-order semantics: emails win over phone-shaped local
  * parts, placeholders are never re-matched, and the count is taken on
  * the progressively redacted text (no double counting of one span).
  */
class PiiRedactSpec extends SparkSuite {

  import spark.implicits._

  private def run(text: String): (String, Long) = {
    val r = Seq(text).toDF("t")
      .select(PiiRedact.redact(col("t")).as("red"),
        PiiRedact.redactionCount(col("t")).as("n"))
      .head()
    (r.getString(0), r.getLong(1))
  }

  test("all three rule types fire once each") {
    val (red, n) = run("mail a.b+c@test.org ip 192.168.1.200 tel 555-1234 end")
    assert(red === "mail <EMAIL> ip <IP> tel <PHONE> end")
    assert(n === 3L) // one email + one IP + one phone
  }

  test("phone-shaped local part belongs to the email, not the phone rule") {
    val (red, n) = run("x 555-1234@spam.example y")
    assert(red === "x <EMAIL> y")
    assert(n === 1L)
  }

  test("multiple matches of one rule all replace and count") {
    val (red, n) = run("a@b.co c@d.org 1.2.3.4 10.0.0.1")
    assert(red === "<EMAIL> <EMAIL> <IP> <IP>")
    assert(n === 4L)
  }

  test("clean text is untouched with zero count") {
    val (red, n) = run("no personal data in this sentence")
    assert(red === "no personal data in this sentence")
    assert(n === 0L)
  }
}
