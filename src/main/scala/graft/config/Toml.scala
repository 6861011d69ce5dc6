package graft.config

import scala.collection.mutable

/** Minimal TOML-subset parser for the engine's config surface — the
  * reference is driven entirely by a TOML file (+ env + flags,
  * `mustConfig` monstache.go:2106-2504), so a config-file front door is
  * part of operator parity, not a convenience.
  *
  * Supported subset (what monstache's own config files use): root
  * `key = value` pairs, `[table]`, `[[array-of-tables]]`, values that are
  * basic strings (with \\ \" \n \t \r escapes), integers, floats,
  * booleans, and single-line arrays thereof; `#` comments. Multi-line
  * strings, dates, dotted keys, and inline tables are out of scope and
  * rejected loudly rather than misparsed. Zero dependencies by
  * construction (the build resolves nothing beyond Spark + scalatest).
  */
object Toml {

  /** Parsed document: root keys, named tables, arrays-of-tables. Values
    * are String | Long | Double | Boolean | Seq[Any].
    *
    * Accessors are TYPE-CHECKED: a mistyped `namespace-regex = true` or
    * `delete-strategy = "2"` is a loud error naming the key and the found
    * type — never a silent toString coercion (which would feed `true` to
    * a regex compile downstream) or a raw ClassCastException (which names
    * neither the key nor the file). The rest of the config front door
    * promises loud failures; the leaf accessors must keep that promise. */
  final case class Doc(root: Map[String, Any],
                       tables: Map[String, Map[String, Any]],
                       arrays: Map[String, Seq[Map[String, Any]]]) {
    def str(key: String): Option[String] = root.get(key).map(Doc.str(key, _))
    def strings(key: String): Seq[String] = root.get(key) match {
      case None => Nil
      case Some(xs: Seq[_]) => xs.map(Doc.str(key, _))
      case Some(other) => Doc.mismatch(key, "array of strings", other)
    }
    def bool(key: String, default: Boolean = false): Boolean =
      root.get(key).map {
        case b: Boolean => b
        case other => Doc.mismatch(key, "boolean", other)
      }.getOrElse(default)
    def int(key: String, default: Int = 0): Int =
      root.get(key).map {
        // toIntExact: a value past Int range must be a loud error, not a
        // silent wrap (max-depth = 4294967296 would wrap to 0 and turn
        // recursion off with no signal)
        case n: Long =>
          try Math.toIntExact(n)
          catch { case _: ArithmeticException =>
            Doc.mismatch(key, "32-bit integer", n)
          }
        case other => Doc.mismatch(key, "integer", other)
      }.getOrElse(default)
    def long(key: String, default: Long = 0L): Long =
      root.get(key).map {
        case n: Long => n
        case other => Doc.mismatch(key, "integer", other)
      }.getOrElse(default)
  }

  object Doc {
    private def typeName(v: Any): String = v match {
      case _: String => "string"
      case _: Long => "integer"
      case _: Double => "float"
      case _: Boolean => "boolean"
      case _: Seq[_] => "array"
      case other => other.getClass.getSimpleName
    }
    private[config] def mismatch(key: String, want: String, found: Any): Nothing =
      throw new IllegalArgumentException(
        s"config key `$key` expects a $want, found ${typeName(found)}: $found")
    /** Typed string extraction shared with the array-of-table readers. */
    private[config] def str(key: String, v: Any): String = v match {
      case s: String => s
      case other => mismatch(key, "string", other)
    }
  }

  def parse(text: String): Doc = {
    val root = mutable.LinkedHashMap[String, Any]()
    val tables = mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, Any]]()
    val arrays = mutable.LinkedHashMap[String, mutable.ListBuffer[mutable.LinkedHashMap[String, Any]]]()
    var current: mutable.LinkedHashMap[String, Any] = root
    for ((raw, idx) <- text.linesIterator.zipWithIndex) {
      val line = stripComment(raw).trim
      val ln = idx + 1
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val name = line.substring(2, line.length - 2).trim
          val m = mutable.LinkedHashMap[String, Any]()
          arrays.getOrElseUpdate(name, mutable.ListBuffer()) += m
          current = m
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          // re-opening a table is a spec violation the reference's parser
          // rejects; silently merging would let an editing leftover
          // override keys with no signal
          require(!tables.contains(name),
            s"TOML line $ln: table [$name] is defined twice")
          current = tables.getOrElseUpdate(
            name, mutable.LinkedHashMap[String, Any]())
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"TOML line $ln: expected `key = value`, got: $line")
          val key = line.substring(0, eq).trim
          // duplicate keys are a TOML error (the reference's parser
          // rejects them); last-win would silently keep the stale value
          // of exactly the kind of leftover edit this front door promises
          // to reject loudly
          require(!current.contains(key),
            s"TOML line $ln: key `$key` is assigned twice")
          current(key) = parseValue(line.substring(eq + 1).trim, ln)
        }
      }
    }
    Doc(root.toMap,
      tables.map { case (k, v) => k -> v.toMap }.toMap,
      arrays.map { case (k, v) => k -> v.map(_.toMap).toSeq }.toMap)
  }

  /** A quote at position `i` is escaped iff preceded by an ODD run of
    * backslashes — checking one character would misread `\\"` (escaped
    * backslash, then a REAL closing quote) as an escaped quote. */
  private def isEscaped(s: String, i: Int): Boolean = {
    var n = 0
    var j = i - 1
    while (j >= 0 && s.charAt(j) == '\\') { n += 1; j -= 1 }
    n % 2 == 1
  }

  /** Drop a trailing `#` comment (quote-aware). */
  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && !isEscaped(line, i)) inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def parseValue(s: String, ln: Int): Any = s match {
    case "true" => true
    case "false" => false
    case _ if s.startsWith("\"") =>
      // the FIRST unescaped quote after the opener must be the LAST
      // character — otherwise `"a" "b"` would silently parse to `a" "b`
      // and `"abc\"` (unterminated: the final quote is escaped) to
      // `abc\`, feeding a typo'd regex/value into the pipeline unseen
      var i = 1
      while (i < s.length && !(s.charAt(i) == '"' && !isEscaped(s, i))) i += 1
      require(i == s.length - 1,
        s"TOML line $ln: malformed string value: $s")
      unescape(s.substring(1, i), ln)
    case _ if s.startsWith("[") && s.endsWith("]") =>
      splitTop(s.substring(1, s.length - 1)).map(v => parseValue(v.trim, ln))
    case _ if s.matches("[+-]?\\d+") =>
      // a Long-overflowing literal must carry the line number like every
      // other parse error, not a bare NumberFormatException
      try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"TOML line $ln: integer out of 64-bit range: $s")
      }
    case _ if s.matches("[+-]?\\d*\\.\\d+") => s.toDouble
    case _ =>
      throw new IllegalArgumentException(
        s"TOML line $ln: unsupported value syntax: $s")
  }

  /** Split a single-line array body on top-level commas (quote-aware). */
  private def splitTop(body: String): Seq[String] = {
    val out = mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '"' && !isEscaped(body, i)) { inStr = !inStr; cur.append(c) }
      else if (c == ',' && !inStr) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def unescape(s: String, ln: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case '"' => sb.append('"')
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case other =>
            throw new IllegalArgumentException(
              s"TOML line $ln: unsupported escape \\$other")
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
