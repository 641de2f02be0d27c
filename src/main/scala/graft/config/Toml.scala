package graft.config

/** Minimal TOML-subset parser — the config front-end's file format
  * (reference: src/config/builder.rs loads TOML/YAML/JSON; the sandbox has
  * no parser dependencies, so this hand-rolls the subset real configs use).
  *
  * Supported: `[table.sub]` headers, `key = value` with dotted keys,
  * strings (basic, with \" \\ \n \t escapes), integers, floats, booleans,
  * flat string/number arrays, `#` comments, and `${VAR}` / `${VAR:-def}`
  * env interpolation inside strings (reference: src/config/vars.rs).
  *
  * The document is a flat ordered map from dotted path → value; table
  * DECLARATION ORDER is preserved (stage order in a pipeline config is
  * meaningful, like the reference's ordered transform graph).
  */
object Toml {

  sealed trait V
  final case class S(s: String) extends V
  final case class I(i: Long) extends V
  final case class F(d: Double) extends V
  final case class B(b: Boolean) extends V
  final case class A(items: Seq[V]) extends V

  final case class Doc(entries: Vector[(String, V)]) {
    private lazy val map = entries.toMap
    def get(path: String): Option[V] = map.get(path)
    def getS(path: String): Option[String] = get(path).collect { case S(s) => s }
    def getI(path: String): Option[Long] = get(path).collect { case I(i) => i }
    def getB(path: String): Option[Boolean] = get(path).collect { case B(b) => b }
    /** Keys under a prefix, in declaration order, first path segment only. */
    def childKeys(prefix: String): Vector[String] =
      entries.collect { case (k, _) if k.startsWith(prefix + ".") =>
        k.stripPrefix(prefix + ".").split('.').head
      }.distinct
    /** Entries directly under a prefix (full remaining path), in order. */
    def under(prefix: String): Vector[(String, V)] =
      entries.collect { case (k, v) if k.startsWith(prefix + ".") =>
        (k.stripPrefix(prefix + "."), v)
      }
  }

  /** Parse with env interpolation (`${VAR}` errors if unset; `${VAR:-d}`
    * falls back).
    */
  def parse(text: String, env: Map[String, String] = sys.env): Doc = {
    val out = Vector.newBuilder[(String, V)]
    var table = ""
    for ((line0, ln) <- text.linesIterator.zipWithIndex) {
      val line = stripComment(line0).trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          require(line.endsWith("]"), s"line ${ln + 1}: bad table header: $line")
          table = line.substring(1, line.length - 1).trim
          require(table.nonEmpty, s"line ${ln + 1}: empty table name")
        } else {
          val eq = indexOfTopLevelEq(line)
          require(eq > 0, s"line ${ln + 1}: expected key = value: $line")
          val key = line.substring(0, eq).trim
          val v = parseValue(line.substring(eq + 1).trim, env, ln + 1)
          val path = if (table.isEmpty) key else s"$table.$key"
          out += ((path, v))
        }
      }
    }
    Doc(out.result())
  }

  /** `#` starts a comment unless inside a quoted string. */
  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"' && (i == 0 || line(i - 1) != '\\')) inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def indexOfTopLevelEq(line: String): Int = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"' && (i == 0 || line(i - 1) != '\\')) inStr = !inStr
      else if (c == '=' && !inStr) return i
      i += 1
    }
    -1
  }

  private def parseValue(raw: String, env: Map[String, String], ln: Int): V = raw match {
    case s if s.startsWith("\"") =>
      require(s.endsWith("\"") && s.length >= 2, s"line $ln: unterminated string: $s")
      S(interpolate(unescape(s.substring(1, s.length - 1)), env, ln))
    case s if s.startsWith("[") =>
      require(s.endsWith("]"), s"line $ln: unterminated array: $s")
      val body = s.substring(1, s.length - 1).trim
      if (body.isEmpty) A(Nil)
      else A(splitTopLevel(body).map(e => parseValue(e.trim, env, ln)))
    case "true" => B(true)
    case "false" => B(false)
    case s if s.matches("[+-]?\\d+") => I(s.toLong)
    case s if s.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => F(s.toDouble)
    case s => throw new IllegalArgumentException(s"line $ln: unsupported value: $s")
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '"' && (i == 0 || s(i - 1) != '\\')) inStr = !inStr
      else if (c == ',' && !inStr) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Single left-to-right pass: each backslash consumes exactly its next
    * char, so "C:\\network" yields C:\network (chained String.replace
    * mangled it — the \n replacement ate the second backslash).
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n'  => sb += '\n'
          case 't'  => sb += '\t'
          case 'r'  => sb += '\r'
          case '"'  => sb += '"'
          case '\\' => sb += '\\'
          case o    => sb += '\\'; sb += o
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private val Var = """\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}""".r

  private def interpolate(s: String, env: Map[String, String], ln: Int): String =
    Var.replaceAllIn(s, m => {
      val name = m.group(1)
      val fallback = Option(m.group(2))
      java.util.regex.Matcher.quoteReplacement(
        env.get(name).orElse(fallback).getOrElse(
          throw new IllegalArgumentException(s"line $ln: undefined env var $${$name}")))
    })
}
