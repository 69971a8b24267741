package graft.util

/** Minimal dependency-free JSON AST + parser + printer for registry
  * persistence (the reference persists a protobuf blob,
  * registry.py:451-613; we persist JSON on any Hadoop-FS path). Only
  * what the registry needs — objects, arrays, strings, numbers, bools,
  * null — no streaming, no comments.
  */
sealed trait JValue {
  def render: String = Json.render(this)
}
object JValue {
  final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
    lazy val map: Map[String, JValue] = fields.toMap
    def apply(k: String): JValue = map.getOrElse(k, JNull)
    def get(k: String): Option[JValue] = map.get(k)
  }
  final case class JArr(items: Vector[JValue]) extends JValue
  final case class JStr(v: String) extends JValue
  final case class JNum(v: Double) extends JValue { def toLong: Long = v.toLong }
  /** Integral literal kept exact: a Double-backed JNum silently corrupts
    * int64 values above 2^53 (snowflake-style ids). The parser emits
    * JInt for plain integer literals that fit a Long. */
  final case class JInt(v: Long) extends JValue { def toLong: Long = v }
  final case class JBool(v: Boolean) extends JValue
  case object JNull extends JValue
}

object Json {
  import JValue._

  def obj(fields: (String, JValue)*): JObj = JObj(fields.toVector)
  def arr(items: Iterable[JValue]): JArr = JArr(items.toVector)
  def str(s: String): JStr = JStr(s)
  def num(n: Double): JNum = JNum(n)
  def num(n: Long): JInt = JInt(n)
  def bool(b: Boolean): JBool = JBool(b)

  /** Exact long from either numeric node (raises on non-integral). */
  def toLong(j: JValue): Long = j match {
    case JInt(v) => v
    case n: JNum if n.v.isWhole => n.toLong
    case other => throw new IllegalArgumentException(s"expected integer, got $other")
  }

  def render(v: JValue): String = v match {
    case JObj(fields) =>
      fields.map { case (k, x) => s"${quote(k)}:${render(x)}" }.mkString("{", ",", "}")
    case JArr(items) => items.map(render).mkString("[", ",", "]")
    case JStr(s) => quote(s)
    case JInt(l) => l.toString
    // keep double syntax ("300.0", not "300") so JNum re-parses as JNum
    case JNum(d) => d.toString
    case JBool(b) => b.toString
    case JNull => "null"
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def parse(input: String): JValue = new Parser(input).parseTop()

  private final class Parser(s: String) {
    private var i = 0
    def parseTop(): JValue = { val v = value(); ws(); require(i >= s.length, s"trailing junk at $i"); v }
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String) = throw new IllegalArgumentException(s"json parse error at $i: $msg")
    private def value(): JValue = {
      ws()
      if (i >= s.length) fail("eof")
      s.charAt(i) match {
        case '{' => obj0()
        case '[' => arr0()
        case '"' => JStr(string0())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => number0()
      }
    }
    private def lit(word: String, v: JValue): JValue =
      if (s.startsWith(word, i)) { i += word.length; v } else fail(s"expected $word")
    private def obj0(): JObj = {
      i += 1; ws()
      val buf = Vector.newBuilder[(String, JValue)]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(buf.result()) }
      while (true) {
        ws()
        val k = string0(); ws()
        if (i >= s.length || s.charAt(i) != ':') fail("expected :")
        i += 1
        buf += (k -> value()); ws()
        if (i >= s.length) fail("eof in object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return JObj(buf.result())
          case c => fail(s"unexpected '$c' in object")
        }
      }
      JObj(buf.result())
    }
    private def arr0(): JArr = {
      i += 1; ws()
      val buf = Vector.newBuilder[JValue]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(buf.result()) }
      while (true) {
        buf += value(); ws()
        if (i >= s.length) fail("eof in array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return JArr(buf.result())
          case c => fail(s"unexpected '$c' in array")
        }
      }
      JArr(buf.result())
    }
    private def string0(): String = {
      if (s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        s.charAt(i) match {
          case '\\' =>
            i += 1
            if (i >= s.length) fail("eof in escape")
            s.charAt(i) match {
              case '"' => sb.append('"'); case '\\' => sb.append('\\')
              case '/' => sb.append('/'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
              case 'r' => sb.append('\r'); case 't' => sb.append('\t')
              case 'u' =>
                // bounds + hex validated: a torn write truncating the
                // file mid-escape must surface as the positioned parse
                // error every other malformed input gets, not a raw
                // StringIndexOutOfBounds / NumberFormatException
                if (i + 5 > s.length) fail("eof in \\u escape")
                val hex = s.substring(i + 1, i + 5)
                if (!hex.forall(c => Character.digit(c, 16) >= 0))
                  fail(s"bad \\u escape \\u$hex")
                sb.append(Integer.parseInt(hex, 16).toChar); i += 4
              case c => fail(s"bad escape \\$c")
            }
            i += 1
          case c => sb.append(c); i += 1
        }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }
    private def number0(): JValue = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("expected value")
      val lit = s.substring(start, i)
      // plain integer literal -> exact JInt; anything else (fraction,
      // exponent, Long overflow) -> JNum double
      if (lit.forall(c => c.isDigit || c == '-' || c == '+'))
        try JInt(lit.toLong) catch { case _: NumberFormatException => JNum(lit.toDouble) }
      else JNum(lit.toDouble)
    }
  }
}
