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
    * read either form. Anchors/aliases and nested block maps inside
    * sequence items remain out of scope (documented divergence — no YAML
    * dependency is allowed in this build).
    */
  def parse(text: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val lines = interpolate(text, env).linesIterator
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))
      .filter { case (_, t) => t.nonEmpty && !t.startsWith("#") }
      .toList
    var stack = List.empty[(Int, String)] // (indent, key-prefix)
    val seqIdx = scala.collection.mutable.Map.empty[String, Int]
    val out = Map.newBuilder[String, String]
    lines.foreach { case (indent, line) =>
      if (line == "-" || line.startsWith("- ")) {
        // sequence item: belongs to the nearest key at indent <= item's
        // (YAML permits items at the SAME indent as their key)
        stack = stack.dropWhile(_._1 > indent)
        val parent = stack.reverse.map(_._2).mkString(".")
        val i = seqIdx.getOrElse(parent, 0)
        seqIdx(parent) = i + 1
        out += s"$parent.$i" -> scalar(line.stripPrefix("-"))
      } else {
        val (key, value) = line.span(_ != ':') match {
          case (k, v) => (unquote(k.trim), scalar(v.drop(1)))
        }
        stack = stack.dropWhile(_._1 >= indent)
        val path = (stack.reverse.map(_._2) :+ key).mkString(".")
        if (value.isEmpty) stack = (indent, key) :: stack
        else out += path -> value
      }
    }
    out.result()
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
