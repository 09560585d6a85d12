package graft.server

/** Minimal JSON codec for the wire protocol (reference serializes wire
  * messages as JSON, `src/protocol/mod.rs:16` "Wire Format: JSON").
  * Values map: object → Map[String, Any] (insertion-ordered), array →
  * Vector[Any], string → String, number → Long when integral else
  * Double, true/false → Boolean, null → null. No external deps — the
  * build only has Spark + the JDK.
  */
object Json {

  def render(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  private def write(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case s: String => writeString(s, sb)
    case b: Boolean => sb.append(if (b) "true" else "false")
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case f: Float => writeDouble(f.toDouble, sb)
    case d: Double => writeDouble(d, sb)
    case bd: BigDecimal => sb.append(bd.toString)
    case m: collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, mv) =>
        if (!first) sb.append(',')
        first = false
        writeString(String.valueOf(k), sb)
        sb.append(':')
        write(mv, sb)
      }
      sb.append('}')
    case xs: Iterable[_] =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        write(x, sb)
      }
      sb.append(']')
    case arr: Array[_] => write(arr.toSeq, sb)
    case other => writeString(String.valueOf(other), sb)
  }

  private def writeDouble(d: Double, sb: StringBuilder): Unit =
    if (d.isNaN || d.isInfinite) sb.append("null")
    else if (d == d.floor && math.abs(d) < 1e15) sb.append(d.toLong)
    else sb.append(d)

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      require(s.startsWith(word, pos), s"bad literal at $pos")
      pos += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = scala.collection.immutable.VectorMap.newBuilder[String, Any]
      if (!eof && s(pos) == '}') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += (k -> value())
        skipWs()
        if (!eof && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      expect('['); skipWs()
      val b = Vector.newBuilder[Any]
      if (!eof && s(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case c => throw new IllegalArgumentException(s"bad escape \\$c at $pos")
          }
          pos += 1
        } else {
          sb.append(s(pos)); pos += 1
        }
      }
      pos += 1
      sb.toString
    }

    private def num(): Any = {
      val start = pos
      if (!eof && (s(pos) == '-' || s(pos) == '+')) pos += 1
      while (!eof && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' ||
        s(pos) == 'E' || s(pos) == '-' || s(pos) == '+')) pos += 1
      val t = s.substring(start, pos)
      require(t.nonEmpty, s"expected number at $start")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble
      else try t.toLong catch { case _: NumberFormatException => t.toDouble }
    }
  }
}
