package graft.geom

import scala.collection.immutable.TreeMap
import scala.collection.mutable.ArrayBuffer

/** Minimal JSON model + parser + canonical writer.
  *
  * Canonical form matches the reference's serde_json output (reference
  * `src/geoq/entity.rs:253` via `serde_json::to_string`): compact (no
  * whitespace), object keys in alphabetical order (serde_json's default Map
  * is a BTreeMap), integers printed bare, floats shortest-round-trip with a
  * mandatory decimal part (`34.0`) — see golden `tests/cli_test.rs:90-125`.
  *
  * Numbers keep their lexical integer-vs-float distinction from the input
  * (`1` stays `1`, `1.0` becomes JDouble → `1.0`), mirroring serde_json's
  * i64/f64 split.
  */
sealed trait JValue
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JLong(l: Long) extends JValue
final case class JDouble(d: Double) extends JValue
final case class JString(s: String) extends JValue
final case class JArray(items: Vector[JValue]) extends JValue
final case class JObject(fields: TreeMap[String, JValue]) extends JValue

object JObject {
  val empty: JObject = JObject(TreeMap.empty[String, JValue])
  def of(kvs: (String, JValue)*): JObject = JObject(TreeMap(kvs: _*))
}

object Json {
  final class ParseException(msg: String) extends Exception(msg)

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new ParseException(s"trailing content at ${p.pos}")
    v
  }

  def parseObject(s: String): JObject = parse(s) match {
    case o: JObject => o
    case _          => throw new ParseException("expected JSON object")
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1
    private def fail(msg: String) = throw new ParseException(s"$msg at $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JString(parseString())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case c => fail(s"unexpected char '$c'")
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length
    }

    private def parseObj(): JObject = {
      expect('{'); skipWs()
      var m = TreeMap.empty[String, JValue]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObject(m) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        val v = parseValue()
        m = m.updated(k, v)
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case _   => fail("expected ',' or '}'")
        }
      }
      JObject(m)
    }

    private def parseArr(): JArray = {
      expect('['); skipWs()
      val buf = new ArrayBuffer[JValue]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArray(buf.toVector) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case _   => fail("expected ',' or ']'")
        }
      }
      JArray(buf.toVector)
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(pos)
        pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            if (atEnd) fail("bad escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 't'  => sb.append('\t')
              case 'u' =>
                if (pos + 4 > s.length) fail("bad unicode escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case _ => fail(s"bad escape '\\$e'")
            }
          case other => sb.append(other)
        }
      }
      throw new IllegalStateException
    }

    private def parseNumber(): JValue = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && s.charAt(pos).isDigit) pos += 1
      var isFloat = false
      if (!atEnd && s.charAt(pos) == '.') {
        isFloat = true; pos += 1
        while (!atEnd && s.charAt(pos).isDigit) pos += 1
      }
      if (!atEnd && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        isFloat = true; pos += 1
        if (!atEnd && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        while (!atEnd && s.charAt(pos).isDigit) pos += 1
      }
      val tok = s.substring(start, pos)
      if (tok.isEmpty || tok == "-") fail("bad number")
      if (isFloat) JDouble(tok.toDouble)
      else
        try JLong(tok.toLong)
        catch { case _: NumberFormatException => JDouble(tok.toDouble) }
    }
  }

  def write(v: JValue): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  def write(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull      => sb.append("null")
    case JBool(b)   => sb.append(if (b) "true" else "false")
    case JLong(l)   => sb.append(l)
    case JDouble(d) => sb.append(Num.json(d))
    case JString(s) => writeString(s, sb)
    case JArray(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        write(it, sb)
      }
      sb.append(']')
    case JObject(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, value) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb)
        sb.append(':')
        write(value, sb)
      }
      sb.append('}')
  }

  def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
