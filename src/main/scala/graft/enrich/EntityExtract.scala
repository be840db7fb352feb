package graft.enrich

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ColumnBridge

/** IPv4/IPv6/domain entity extraction (ipHandle/entity/parse.go:12-67 with
  * the exact regexes of ipHandle/re/re.go:6-9): scan a line with all three
  * patterns, order matches by start position (ties resolved IPv4 > IPv6 >
  * domain, the reference's insertion order), and keep the leftmost
  * non-overlapping set. Output is structured — array of (etype, text,
  * start) — instead of the reference's render-then-reparse text form; the
  * observable entities are identical.
  */
object EntityExtract {

  // Verbatim RE2 patterns from re.go (valid Java regex unchanged).
  val Ipv4Pattern: Pattern = Pattern.compile(
    "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}")
  val Ipv6Pattern: Pattern = Pattern.compile(
    "fe80:(:[0-9a-fA-F]{1,4}){0,4}(%\\w+)?|([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|(([0-9a-fA-F]{1,4}:){0,6}[0-9a-fA-F]{1,4})?::(([0-9a-fA-F]{1,4}:){0,6}[0-9a-fA-F]{1,4})?")
  val DomainPattern: Pattern = Pattern.compile(
    "[a-zA-Z0-9][-a-zA-Z0-9]{0,62}(\\.[a-zA-Z0-9][-a-zA-Z0-9]{0,62})+")

  final case class Found(etype: String, text: String, start: Int)

  /** Pure extraction core (shared by the expression and tests). */
  def extract(line: String): Seq[Found] = {
    val all = ArrayBuffer.empty[(Int, Int, Int, String)] // (start, prio, end, ...)
    def scan(p: Pattern, prio: Int, etype: String): Unit = {
      val m = p.matcher(line)
      while (m.find()) all += ((m.start, prio, m.end, etype))
    }
    scan(Ipv4Pattern, 0, "ipv4")
    scan(Ipv6Pattern, 1, "ipv6")
    scan(DomainPattern, 2, "domain")
    val sorted = all.sortBy(t => (t._1, t._2))
    val out = ArrayBuffer.empty[Found]
    var idx = 0
    sorted.foreach { case (start, _, end, etype) =>
      if (start >= idx) {
        out += Found(etype, line.substring(start, end), start)
        idx = end
      }
    }
    out.toSeq
  }

  def entities(text: Column): Column =
    ColumnBridge.col(ExtractEntities(ColumnBridge.expr(text)))
}

case class ExtractEntities(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("etype", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val found = EntityExtract.extract(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(found.map(f => InternalRow(
      UTF8String.fromString(f.etype), UTF8String.fromString(f.text),
      f.start)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CDN domain lookup (ipHandle/pkg/cdn/cdn.go:62-87): reduce to the base
  * domain (`a.b.c → b.c`), exact-match a broadcast map, with the special
  * `kunlun` substring fallback. */
object Cdn {

  def baseCname(domain: String): String = {
    val parts = domain.split('.')
    if (parts.length < 2) domain
    else parts(parts.length - 2) + "." + parts(parts.length - 1)
  }

  def find(data: Map[String, String], domain: String): Option[String] = {
    val base = baseCname(domain)
    data.get(base).orElse(
      if (base.contains("kunlun")) Some("阿里云 CDN") else None)
  }

  /** Column form: broadcast-map lookup over a domain column. */
  def lookup(data: Map[String, String])(domain: Column): Column =
    ColumnBridge.col(CdnLookup(ColumnBridge.expr(domain), data))
}

case class CdnLookup(child: Expression, data: Map[String, String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Cdn.find(data, input.asInstanceOf[UTF8String].toString)
      .map(UTF8String.fromString).orNull

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
