package graft.functions

/** Go `strconv.ParseInt`/`ParseUint` semantics (base 10), as relied on by
  * the reference's writer when narrowing Int64 values into ClickHouse
  * UInt8..Int64 columns and pinned by parser/parser_test.go:609-663:
  * syntax errors yield 0; out-of-range values CLAMP to the type border
  * (Go returns the clamped value alongside ErrRange and the reference
  * keeps the value).
  */
object GoInts {

  private def isIntToken(s: String, allowSign: Boolean): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    if (allowSign && (s.charAt(0) == '+' || s.charAt(0) == '-')) i = 1
    if (i >= s.length) return false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** strconv.ParseInt(s, 10, bits): syntax error → 0; range error →
    * clamp to [-2^(bits-1), 2^(bits-1)-1]. Result widened to Long. */
  def parseInt(s: String, bits: Int): Long = {
    if (!isIntToken(s, allowSign = true)) return 0L
    val v = BigInt(s)
    val max = (BigInt(1) << (bits - 1)) - 1
    val min = -(BigInt(1) << (bits - 1))
    if (v > max) max.toLong else if (v < min) min.toLong else v.toLong
  }

  /** strconv.ParseUint(s, 10, bits): signs are syntax errors → 0; range
    * error → clamp to 2^bits - 1. Result is the unsigned bit pattern in a
    * Long (so parseUint("18446744073709551615", 64) == -1L). */
  def parseUint(s: String, bits: Int): Long = {
    if (!isIntToken(s, allowSign = false)) return 0L
    val v = BigInt(s)
    val max = (BigInt(1) << bits) - 1
    (if (v > max) max else v).longValue
  }
}
