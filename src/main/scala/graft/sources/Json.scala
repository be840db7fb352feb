package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal JSON tree with fastjson-compatible semantics
  * (github.com/valyala/fastjson as used by parser/fastjson.go):
  *
  *  - numbers keep their raw token text; `int64` access is a strict
  *    re-parse of the token (non-integral / out-of-range → failure) and
  *    `float64` is best-effort, so u64-overflow and `123.321` behave
  *    exactly like the reference's typed getters;
  *  - bare `inf` / `+inf` / `-inf` / `nan` tokens are accepted as numbers
  *    (fastjson extension exercised by parser/parser_test.go:60);
  *  - `text` of a non-string value is its compact JSON serialization
  *    (fastjson `Value.String()`).
  */
sealed trait JValue {
  /** compact JSON text (fastjson Value.String()) */
  def compact: String = {
    val sb = new java.lang.StringBuilder
    JValue.write(this, sb)
    sb.toString
  }
}

object JValue {
  case object JNull extends JValue
  final case class JBool(b: Boolean) extends JValue
  final case class JNum(raw: String) extends JValue {
    /** strconv.ParseInt semantics: whole raw token, base 10, int64 range */
    def int64: Option[Long] =
      try Some(java.lang.Long.parseLong(raw)) catch { case _: NumberFormatException => None }
    /** strconv.ParseFloat semantics incl. inf/nan tokens */
    def float64: Double = {
      val low = raw.toLowerCase
      if (low == "inf" || low == "+inf" || low == "infinity" || low == "+infinity")
        Double.PositiveInfinity
      else if (low == "-inf" || low == "-infinity") Double.NegativeInfinity
      else if (low == "nan" || low == "+nan" || low == "-nan") Double.NaN
      else java.lang.Double.parseDouble(raw)
    }
  }
  final case class JStr(s: String) extends JValue
  final case class JArr(items: Array[JValue]) extends JValue
  final case class JObj(fields: ArrayBuffer[(String, JValue)]) extends JValue {
    def get(key: String): JValue = {
      var i = 0
      while (i < fields.length) {
        if (fields(i)._1 == key) return fields(i)._2
        i += 1
      }
      null
    }
  }

  private[sources] def write(v: JValue, sb: java.lang.StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(raw) => sb.append(raw)
    case JStr(s) => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var i = 0
      while (i < items.length) {
        if (i > 0) sb.append(',')
        write(items(i), sb)
        i += 1
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var i = 0
      while (i < fields.length) {
        if (i > 0) sb.append(',')
        writeString(fields(i)._1, sb)
        sb.append(':')
        write(fields(i)._2, sb)
        i += 1
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

/** Recursive-descent JSON parser for [[JValue]]. Not reentrant; one
  * instance per expression instance / partition. */
final class JsonParser {
  import JValue._

  private var s: String = _
  private var pos: Int = 0

  def parse(input: String): Option[JValue] = {
    s = input
    pos = 0
    try {
      skipWs()
      val v = parseValue()
      skipWs()
      if (pos != s.length) None else Some(v)
    } catch {
      case _: JsonParseError | _: StringIndexOutOfBoundsException => None
    }
  }

  private final class JsonParseError extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new JsonParseError

  private def skipWs(): Unit =
    while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
      s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1

  private def parseValue(): JValue = {
    if (pos >= s.length) fail()
    s.charAt(pos) match {
      case '{' => parseObject()
      case '[' => parseArray()
      case '"' => JStr(parseString())
      case 't' => expect("true"); JBool(true)
      case 'f' => expect("false"); JBool(false)
      case 'n' =>
        // 'null' or 'nan'
        if (s.startsWith("null", pos)) { pos += 4; JNull } else parseNumber()
      case _ => parseNumber()
    }
  }

  private def expect(lit: String): Unit =
    if (s.startsWith(lit, pos)) pos += lit.length else fail()

  private def parseObject(): JObj = {
    pos += 1 // '{'
    val fields = new ArrayBuffer[(String, JValue)]
    skipWs()
    if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(fields) }
    while (true) {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != '"') fail()
      val k = parseString()
      skipWs()
      if (pos >= s.length || s.charAt(pos) != ':') fail()
      pos += 1
      skipWs()
      val v = parseValue()
      fields += ((k, v))
      skipWs()
      if (pos >= s.length) fail()
      s.charAt(pos) match {
        case ',' => pos += 1
        case '}' => pos += 1; return JObj(fields)
        case _ => fail()
      }
    }
    JObj(fields) // unreachable
  }

  private def parseArray(): JArr = {
    pos += 1 // '['
    val items = new ArrayBuffer[JValue]
    skipWs()
    if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(items.toArray) }
    while (true) {
      skipWs()
      items += parseValue()
      skipWs()
      if (pos >= s.length) fail()
      s.charAt(pos) match {
        case ',' => pos += 1
        case ']' => pos += 1; return JArr(items.toArray)
        case _ => fail()
      }
    }
    JArr(items.toArray) // unreachable
  }

  private def parseString(): String = {
    pos += 1 // '"'
    val sb = new java.lang.StringBuilder
    while (true) {
      if (pos >= s.length) fail()
      val c = s.charAt(pos)
      if (c == '"') { pos += 1; return sb.toString }
      else if (c == '\\') {
        pos += 1
        if (pos >= s.length) fail()
        s.charAt(pos) match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case '/' => sb.append('/')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'u' =>
            if (pos + 4 >= s.length) fail()
            val code = try Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
              catch { case _: NumberFormatException => fail() }
            sb.append(code.toChar)
            pos += 4
          case _ => fail()
        }
        pos += 1
      } else { sb.append(c); pos += 1 }
    }
    "" // unreachable
  }

  /** True iff `lit` (lowercase) matches s at `pos` case-insensitively —
    * allocation-free (this runs per numeric token on the hot path). */
  private def matchesIgnoreCase(lit: String): Boolean = {
    if (pos + lit.length > s.length) return false
    var i = 0
    while (i < lit.length) {
      if (Character.toLowerCase(s.charAt(pos + i)) != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  /** JSON number grammar plus fastjson's inf/nan extension. */
  private def parseNumber(): JNum = {
    val start = pos
    if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
    // inf / infinity / nan (case-insensitive)
    if (matchesIgnoreCase("infinity")) pos += 8
    else if (matchesIgnoreCase("inf")) pos += 3
    else if (matchesIgnoreCase("nan")) pos += 3
    else {
      var digits = 0
      while (pos < s.length && Character.isDigit(s.charAt(pos))) { pos += 1; digits += 1 }
      if (digits == 0) fail()
      if (pos < s.length && s.charAt(pos) == '.') {
        pos += 1
        var fd = 0
        while (pos < s.length && Character.isDigit(s.charAt(pos))) { pos += 1; fd += 1 }
        if (fd == 0) fail()
      }
      if (pos < s.length && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        pos += 1
        if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
        var ed = 0
        while (pos < s.length && Character.isDigit(s.charAt(pos))) { pos += 1; ed += 1 }
        if (ed == 0) fail()
      }
    }
    JNum(s.substring(start, pos))
  }
}
