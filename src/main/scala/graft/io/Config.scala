package graft.io

import org.apache.spark.sql.SparkSession

/** Configuration loading (reference: src/ketl/config.py + spark/utils.py:239
  * create_spark_session_from_config).
  *
  * The reference reads YAML with `${ENV_VAR}` / `${ENV_VAR:default}`
  * interpolation. No YAML library ships in this build, so this parses the
  * indentation-nested key/value subset the reference's configs actually use
  * (see its tests/resources yml files) into dotted keys, with the same
  * interpolation syntax.
  */
object Config {

  private val EnvVar = """\$\{([^}:]+)(?::([^}]*))?\}""".r

  /** `${VAR}` → env value (empty if unset); `${VAR:default}` → default when
    * unset (reference: src/ketl/config.py:36-45).
    */
  def interpolate(s: String, env: Map[String, String] = sys.env): String =
    EnvVar.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), Option(m.group(2)).getOrElse(""))))

  /** Strips one pair of MATCHING quotes (double or single), YAML-style;
    * unquoted values keep embedded quotes as-is.
    */
  private def unquote(s: String): String =
    if (s.length >= 2 &&
        ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  /** An unquoted YAML scalar ends at the first ` #` (inline comment);
    * quoted scalars keep their `#`s.
    */
  private def scalar(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("\"") || t.startsWith("'")) unquote(t)
    // a value that is ONLY a comment (`key:  # note`) is an empty value —
    // the key is a section header; a literal '#' value must be quoted
    else if (t.startsWith("#")) ""
    else t.split(" #", 2)(0).trim
  }

  /** Parses a flow collection value (`[a, b]` / `{k: v}`) into dotted-suffix
    * → scalar pairs, or None when `t` is not one. Nested flow collections
    * recurse (`[{k: v}]` → `0.k`); quotes protect commas/brackets/colons;
    * a trailing ` # comment` after the closing bracket is allowed. Empty
    * collections parse to zero pairs (the key simply has no entries — the
    * reference's own `config: {}` default). Multi-document streams remain
    * out of scope.
    */
  private def flowPairs(t0: String): Option[Seq[(String, String)]] = {
    val t = t0.trim
    // split `body` at top-level commas (depth 0, outside quotes)
    def splitTop(body: String): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var quote: Char = 0
      body.foreach { c =>
        if (quote != 0) { cur += c; if (c == quote) quote = 0 }
        else c match {
          case '"' | '\'' => quote = c; cur += c
          case '[' | '{' => depth += 1; cur += c
          case ']' | '}' => depth -= 1; cur += c
          case ',' if depth == 0 => parts += cur.toString; cur.clear()
          case other => cur += other
        }
      }
      parts += cur.toString
      parts.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    // the collection body, iff the bracket closes with nothing but an
    // optional comment after it
    def body: Option[String] = {
      var depth = 0; var quote: Char = 0; var end = -1; var i = 0
      while (i < t.length && end < 0) {
        val c = t(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else c match {
          case '"' | '\'' => quote = c
          case '[' | '{' => depth += 1
          case ']' | '}' => depth -= 1; if (depth == 0) end = i
          case _ => ()
        }
        i += 1
      }
      val tail = if (end < 0) "x" else t.substring(end + 1).trim
      if (end >= 0 && (tail.isEmpty || tail.startsWith("#")))
        Some(t.substring(1, end))
      else None
    }
    if (t.startsWith("[")) body.map(splitTop(_).zipWithIndex.flatMap {
      case (e, i) => flowPairs(e) match {
        case Some(nested) => nested.map { case (sfx, v) => (s"$i.$sfx", v) }
        case None => Seq((i.toString, unquote(e)))
      }
    })
    else if (t.startsWith("{")) body.map(splitTop(_).flatMap { e =>
      val (k, v) = e.span(_ != ':')
      val vv = v.drop(1).trim
      flowPairs(vv) match {
        case Some(nested) =>
          nested.map { case (sfx, x) => (s"${unquote(k.trim)}.$sfx", x) }
        case None => Seq((unquote(k.trim), unquote(vv)))
      }
    })
    else None
  }

  /** Multi-document stream (round 10 — the final YAML gap): split on the
    * standard column-0 `---` document-start and `...` document-end
    * markers and parse each document independently. Sound without parser
    * cooperation because block-scalar/collection CONTENT is always
    * indented — a column-0 `---` can never be document content in the
    * supported subset. Empty documents (e.g. a `...` immediately followed
    * by `---`) are dropped; a leading `---` header is the normal case.
    */
  def parseAll(text: String, env: Map[String, String] = sys.env): Seq[Map[String, String]] = {
    val docs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    text.linesIterator.foreach { l =>
      if (l.matches("""---(\s.*)?""") || l.matches("""\.\.\.\s*"""))
        docs += scala.collection.mutable.ArrayBuffer.empty[String]
      else docs.last += l
    }
    docs.toSeq.map(_.mkString("\n")).filter(_.trim.nonEmpty).map(parse(_, env))
  }

  /** Parses the indented `key: value` subset into dotted keys:
    * {{{
    * spark:
    *   master: local[4]     ->  Map("spark.master" -> "local[4]", ...)
    *   config:
    *     spark.ui.enabled: "false"
    * }}}
    *
    * Block sequences flatten to ZERO-BASED dotted indices, at the item
    * order of the document (YAML allows items at the parent key's indent
    * or deeper):
    * {{{
    * inputs:
    *   - a.parquet          ->  Map("inputs.0" -> "a.parquet",
    *   - b.parquet               "inputs.1" -> "b.parquet")
    * }}}
    * Consumers that accept lists ([[graft.etl.Workflow]] step `inputs`)
    * read either form.
    *
    * Also covered (extended round 8 — closes the last documented YAML
    * gaps): nested block maps inside sequence items (`- name: a` with
    * continuation keys at the item's content indent → `steps.0.name`,
    * `steps.0.inputs`, …), anchors/aliases (`key: &name …` / `other:
    * *name`, both scalar and whole-subtree) with `<<: *name` merge keys
    * (explicit keys win over merged ones, YAML semantics), and literal /
    * folded block scalars (`key: |`, `key: >`, with `-`/`+` chomping).
    * Inline flow collections (round 10): `key: [a, b]` flattens like a
    * block sequence (`key.0`, `key.1`), `key: {k: v}` like a block map
    * (`key.k`), nesting and quoting respected ([[flowPairs]]). Multi-
    * document streams parse via [[parseAll]] — no remaining YAML gaps in
    * the subset real configs use (no YAML dependency is allowed in this
    * build).
    */
  def parse(text: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val raw = interpolate(text, env).linesIterator.toArray
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // anchor name -> Left(scalar value) | Right(subtree path prefix)
    val anchors = scala.collection.mutable.Map.empty[String, Either[String, String]]
    var stack = List.empty[(Int, String)] // (indent, key-prefix)
    val seqIdx = scala.collection.mutable.Map.empty[String, Int]
    val Anchor = """&([\w.-]+)\s*(.*)""".r
    val Alias = """\*([\w.-]+)""".r
    val Block = """([|>])([+-]?)""".r

    def copySubtree(from: String, to: String, keepExisting: Boolean): Unit =
      out.toList.foreach { case (k, v) =>
        if (k == from || k.startsWith(from + ".")) {
          val dst = to + k.stripPrefix(from)
          if (!keepExisting || !out.contains(dst)) out(dst) = v
        }
      }

    /** Consumes a literal/folded block scalar after line `i`; returns
      * (value, next line index). Content = lines more indented than the
      * key (plus interior blanks); the first content line fixes the strip
      * indent. Chomping: `-` drops trailing newlines, default keeps one,
      * `+` keeps them all.
      */
    def blockScalar(style: Char, chomp: String, keyIndent: Int, start: Int): (String, Int) = {
      var i = start
      val body = scala.collection.mutable.ArrayBuffer.empty[String]
      var strip = -1
      while (i < raw.length && {
        val ind = raw(i).takeWhile(_ == ' ').length
        raw(i).trim.isEmpty || ind > keyIndent
      }) {
        if (raw(i).trim.isEmpty) body += ""
        else {
          if (strip < 0) strip = raw(i).takeWhile(_ == ' ').length
          body += raw(i).drop(strip min raw(i).takeWhile(_ == ' ').length)
        }
        i += 1
      }
      var trailingBlanks = 0
      while (body.nonEmpty && body.last.isEmpty) {
        body.remove(body.length - 1); trailingBlanks += 1
      }
      val joined =
        if (style == '|') body.mkString("\n")
        else body.foldLeft(List.empty[String]) {
          case (acc, "") => "" :: acc
          case ("" :: rest, l) => l :: "" :: rest
          case (prev :: rest, l) => s"$prev $l" :: rest
          case (Nil, l) => l :: Nil
        }.reverse.mkString("\n")
      val value = chomp match {
        case "-" => joined
        case "+" => joined + "\n" * (trailingBlanks + 1)
        case _ => if (joined.isEmpty) "" else joined + "\n"
      }
      (value, i)
    }

    /** One `key: value` (or bare alias/anchor value) at `path`: resolves
      * anchors, aliases, and block indicators; returns the next line index
      * and whether the key opened a section (caller pushes the frame).
      */
    def emit(path: String, rawValue: String, keyIndent: Int, next: Int): (Int, Boolean) =
      rawValue.trim match {
        case Anchor(name, rest) if rest.trim.isEmpty =>
          anchors(name) = Right(path); (next, true)
        case Anchor(name, rest) =>
          val v = scalar(rest); anchors(name) = Left(v); out(path) = v; (next, false)
        case Alias(name) => anchors.get(name) match {
          case Some(Left(v)) => out(path) = v; (next, false)
          case Some(Right(prefix)) => copySubtree(prefix, path, keepExisting = false); (next, false)
          case None => out(path) = "*" + name; (next, false)
        }
        case Block(style, chomp) =>
          val (v, ni) = blockScalar(style.head, chomp, keyIndent, next)
          out(path) = v; (ni, false)
        case t => flowPairs(t) match {
          case Some(pairs) =>
            pairs.foreach { case (sfx, v) => out(s"$path.$sfx") = v }
            (next, false)
          case None =>
            val v = scalar(t)
            if (v.isEmpty) (next, true) else { out(path) = v; (next, false) }
        }
      }

    var i = 0
    while (i < raw.length) {
      val indent = raw(i).takeWhile(_ == ' ').length
      val line = raw(i).trim
      i += 1
      if (line.nonEmpty && !line.startsWith("#")) {
        if (line == "-" || line.startsWith("- ")) {
          // sequence item: belongs to the nearest key at indent <= item's
          // (YAML permits items at the SAME indent as their key)
          stack = stack.dropWhile(_._1 > indent)
          val parent = stack.reverse.map(_._2).mkString(".")
          val idx = seqIdx.getOrElse(parent, 0)
          seqIdx(parent) = idx + 1
          val rest = line.stripPrefix("-")
          val content = rest.dropWhile(_ == ' ')
          val contentIndent = indent + (rest.length - content.length) + 1
          if (!content.startsWith("\"") && !content.startsWith("'") &&
              !content.startsWith("[") && !content.startsWith("{") &&
              (content.contains(": ") || content.endsWith(":"))) {
            // a block map starts INSIDE the item: the first key is on the
            // dash line, siblings follow at the item's content indent —
            // the frame sits one column left of it so they nest, while a
            // sibling dash (or parent key) at the dash indent pops it
            stack = (contentIndent - 1, idx.toString) :: stack
            val (k, v) = content.span(_ != ':')
            val path = (stack.reverse.map(_._2) :+ unquote(k.trim)).mkString(".")
            val (ni, opened) = emit(path, v.drop(1), contentIndent - 1, i)
            i = ni
            if (opened) stack = (contentIndent, unquote(k.trim)) :: stack
          } else {
            val (ni, _) = emit(s"$parent.$idx", content, indent, i)
            i = ni
          }
        } else {
          val (key0, value) = line.span(_ != ':')
          val key = unquote(key0.trim)
          stack = stack.dropWhile(_._1 >= indent)
          if (key == "<<") value.drop(1).trim match {
            case Alias(name) => anchors.get(name).collect { case Right(prefix) =>
              copySubtree(prefix, stack.reverse.map(_._2).mkString("."), keepExisting = true)
            }
            case _ => ()
          } else {
            val path = (stack.reverse.map(_._2) :+ key).mkString(".")
            val (ni, opened) = emit(path, value.drop(1), indent, i)
            i = ni
            if (opened) stack = (indent, key) :: stack
          }
        }
      }
    }
    out.toMap
  }

  /** Builds a SparkSession from a parsed config: `master`, `appName`, and
    * every `config.*` entry (reference: src/ketl/spark/utils.py:239-262).
    */
  def sparkSession(conf: Map[String, String]): SparkSession = {
    var b = SparkSession.builder()
    conf.get("master").foreach(m => b = b.master(m))
    conf.get("appName").foreach(a => b = b.appName(a))
    conf.collect { case (k, v) if k.startsWith("config.") => (k.drop("config.".length), v) }
      .foreach { case (k, v) => b = b.config(k, v) }
    b.getOrCreate()
  }
}
