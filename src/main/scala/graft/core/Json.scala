package graft.core

/** Minimal JSON writer (no deps): strings, numbers, arrays, ordered objects. */
object Json {
  def str(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def arr(items: IterableOnce[String]): String =
    items.iterator.mkString("[", ",", "]")
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")

  /** Parse a JSON array of FLAT objects whose values are all strings (the
    * shape [[obj]] emits for manifest file stats): one Map per object, in
    * array order. Escape-aware, so values may contain any character —
    * including the `{`/`}`/`,` framing that breaks regex-based parsing.
    * Deliberately NOT a general JSON parser: nested values are a caller
    * bug and fail loudly. */
  def parseFlatObjects(text: String): Seq[Map[String, String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    var i = 0
    def skipWs(): Unit = while (i < text.length && text(i).isWhitespace) i += 1
    def parseString(): String = {
      require(text(i) == '"', s"expected string at $i")
      val sb = new StringBuilder
      i += 1
      while (text(i) != '"') {
        if (text(i) == '\\') {
          i += 1
          text(i) match {
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b' // standard writers emit \b/\f — decoding
            case 'f' => sb += '\f' // them as literal 'b'/'f' corrupts values
            case 'u' =>
              sb += Integer.parseInt(text.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => sb += c
          }
        } else sb += text(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    skipWs()
    require(i < text.length && text(i) == '[', "expected array")
    i += 1
    skipWs()
    while (i < text.length && text(i) != ']') {
      require(text(i) == '{', s"expected object at $i")
      i += 1
      val m = scala.collection.mutable.LinkedHashMap[String, String]()
      skipWs()
      while (text(i) != '}') {
        skipWs()
        val k = parseString()
        skipWs()
        require(text(i) == ':', s"expected ':' at $i")
        i += 1
        skipWs()
        m(k) = parseString()
        skipWs()
        if (text(i) == ',') { i += 1; skipWs() }
      }
      i += 1
      out += m.toMap
      skipWs()
      if (i < text.length && text(i) == ',') { i += 1; skipWs() }
    }
    // a torn/truncated array that ends cleanly after an object's '}' must
    // fail loudly, not parse as a shorter array
    require(i < text.length && text(i) == ']',
      s"unterminated array: expected ']' at $i of ${text.length}")
    out.toSeq
  }
}
