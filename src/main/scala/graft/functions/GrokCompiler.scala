package graft.functions

/** Offline grok → plain-regex compiler (SURVEY.md §2.2 P1, §7.4).
  *
  * Logstash's grok filter expands `%{PATTERN:field}` references against a
  * pattern library into one large regex, then matches each event's `message`
  * (public Logstash semantics; the sig-filter pipelines in the reference all
  * sit behind a grok stage). We compile once at plan-construction time — the
  * runtime is a single Catalyst-native regex match per row (RegexStructExtract
  * or `regexp_extract`), never an interpreted pattern walk.
  *
  * The library patterns are deliberately non-capturing, so the i-th
  * `%{NAME:field}` occurrence is exactly capture group i+1 — field→group
  * mapping needs no named groups (Java named groups reject underscores).
  */
object GrokCompiler {

  /** Built-in pattern library (subset of the public grok-patterns base set,
    * all non-capturing). */
  val Library: Map[String, String] = Map(
    "WORD"       -> "\\w+",
    "USER"       -> "[a-zA-Z0-9._-]+",
    "INT"        -> "[+-]?\\d+",
    "NUMBER"     -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP"         -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "HOST"       -> "[a-zA-Z0-9._-]+",
    "HOSTNAME"   -> "[a-zA-Z0-9._-]+",
    "HASH"       -> "[a-fA-F0-9]{32,64}",
    "URIPATH"    -> "/[^\\s?#]*",
    "NOTSPACE"   -> "\\S+",
    "DATA"       -> ".*?",
    "GREEDYDATA" -> ".*"
  )

  /** Compiled form: one regex; `fields` in capture-group order (group i+1). */
  final case class CompiledGrok(regex: String, fields: Seq[String]) {
    def groupOf(field: String): Int = fields.indexOf(field) + 1
  }

  /** Multi-pattern grok: Logstash `match` takes a LIST of patterns and the
    * first that matches wins («grok» docs; `_grokparsefailure` only when ALL
    * miss). `fields` = union of every pattern's fields in first-appearance
    * order; `groupMaps(k)(i)` = unified field index of pattern k's capture
    * group i+1. */
  final case class MultiGrok(patterns: Seq[CompiledGrok], fields: Seq[String]) {
    val groupMaps: Seq[Seq[Int]] = patterns.map(_.fields.map(fields.indexOf))
  }

  /** Compile a first-match-wins pattern list (size 1 = plain grok). */
  def compileMulti(patterns: Seq[String],
      library: Map[String, String] = Library): MultiGrok = {
    require(patterns.nonEmpty, "at least one grok pattern required")
    val compiled = patterns.map(p => compile(p, library))
    MultiGrok(compiled, compiled.flatMap(_.fields).distinct)
  }

  private val Ref = "%\\{(\\w+)(?::(\\w+))?\\}".r

  /** Expand `%{NAME:field}` refs. Literal text between refs passes through as
    * regex (grok semantics — literals may themselves be regex metachars). */
  def compile(pattern: String, library: Map[String, String] = Library): CompiledGrok = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var last = 0
    for (m <- Ref.findAllMatchIn(pattern)) {
      sb.append(pattern.substring(last, m.start))
      val name = m.group(1)
      val field = Option(m.group(2))
      val pat = library.getOrElse(
        name,
        throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
      field match {
        case Some(f) => fields += f; sb.append("(").append(pat).append(")")
        case None    => sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    sb.append(pattern.substring(last))
    CompiledGrok(sb.toString, fields.toSeq)
  }
}
