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

  /** Built-in pattern library — the RE2-safe core of the public
    * grok-patterns base set (no backreferences, no atomic groups, no
    * lookaround, so a compiled regex runs identically under java.util.regex,
    * Spark, and RE2-based engines). Library entries may reference OTHER
    * entries with `%{NAME}` / `%{NAME:field}` — [[compile]] expands
    * recursively, so composite patterns (COMMONAPACHELOG, SYSLOGBASE-style
    * timestamps) work exactly like Logstash's shipped pattern files. */
  val Library: Map[String, String] = Map(
    // --- primitives
    "WORD"       -> "\\w+",
    "USER"       -> "[a-zA-Z0-9._-]+",
    "USERNAME"   -> "[a-zA-Z0-9._-]+",
    "INT"        -> "[+-]?\\d+",
    "POSINT"     -> "[1-9][0-9]*",
    "NONNEGINT"  -> "[0-9]+",
    "NUMBER"     -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE10NUM"  -> "[+-]?(?:[0-9]+(?:\\.[0-9]+)?|\\.[0-9]+)",
    "BASE16NUM"  -> "(?:0[xX])?[0-9a-fA-F]+",
    "IP"         -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "IPV6"       -> "(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:){1,7}:|(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}|:(?::[0-9A-Fa-f]{1,4}){1,7}|::)",
    "HOST"       -> "[a-zA-Z0-9._-]+",
    "HOSTNAME"   -> "[a-zA-Z0-9._-]+",
    "IPORHOST"   -> "(?:%{IP}|%{HOSTNAME})",
    "HASH"       -> "[a-fA-F0-9]{32,64}",
    "UUID"       -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC"        -> "(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "COMMONMAC"  -> "(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "EMAILADDRESS" -> "[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+(?:\\.[a-zA-Z0-9-]+)+",
    "QUOTEDSTRING" -> "\"(?:\\\\.|[^\"\\\\])*\"",  // single-char alternatives: (X+)* would backtrack exponentially on an unterminated quote
    "QS"         -> "%{QUOTEDSTRING}",
    "NOTSPACE"   -> "\\S+",
    "DATA"       -> ".*?",
    "GREEDYDATA" -> ".*",
    "LOGLEVEL"   -> "(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|[Aa]lert|ALERT|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)",
    // --- paths and URIs
    "UNIXPATH"   -> "(?:/[\\w.+-]+)+/?",
    "WINPATH"    -> "(?:[A-Za-z]:)(?:\\\\[^\\\\?*\\s]*)+",
    "PATH"       -> "(?:%{UNIXPATH}|%{WINPATH})",
    "URIPATH"    -> "/[^\\s?#]*",
    "URIPROTO"   -> "[A-Za-z][A-Za-z0-9+.-]*",
    "URIPARAM"   -> "\\?[^\\s]*",
    "URIHOST"    -> "%{IPORHOST}(?::%{POSINT})?",
    "URIPATHPARAM" -> "%{URIPATH}(?:%{URIPARAM})?",
    "URI"        -> "%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?%{URIHOST}(?:%{URIPATHPARAM})?",
    // --- date/time atoms (composite via recursion)
    "YEAR"       -> "(?:\\d\\d){1,2}",
    "MONTHNUM"   -> "(?:0?[1-9]|1[0-2])",
    "MONTHDAY"   -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH"      -> "(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)",
    "HOUR"       -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE"     -> "(?:[0-5][0-9])",
    "SECOND"     -> "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME"       -> "%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "ISO8601_TIMEZONE" -> "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "SYSLOGTIMESTAMP" -> "%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE"   -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    // --- composite log lines (fields captured by the NESTED refs, exactly
    // like the shipped Logstash pattern files)
    "HTTPDUSER"  -> "(?:%{EMAILADDRESS}|%{USER})",
    "COMMONAPACHELOG" -> "%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} \\[%{HTTPDATE:timestamp}\\] \"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" %{NUMBER:response} (?:%{NUMBER:bytes}|-)",
    "COMBINEDAPACHELOG" -> "%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}"
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

  /** Expand `%{NAME:field}` refs RECURSIVELY (library entries may reference
    * other entries — composite patterns). Literal text between refs passes
    * through as regex (grok semantics — literals may themselves be regex
    * metachars). Fields are recorded in capture-group order: a named ref's
    * own group opens before any groups its expansion introduces, so
    * `fields(i)` is exactly capture group i+1 of the compiled regex. */
  def compile(pattern: String, library: Map[String, String] = Library): CompiledGrok = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    def expand(p: String, depth: Int): String = {
      require(depth <= 16,
        s"grok pattern expansion exceeds depth 16 (reference cycle?): $pattern")
      val sb = new StringBuilder
      var last = 0
      for (m <- Ref.findAllMatchIn(p)) {
        sb.append(p.substring(last, m.start))
        val name = m.group(1)
        val field = Option(m.group(2))
        val pat = library.getOrElse(
          name,
          throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        field match {
          case Some(f) =>
            fields += f // group opens here, before nested groups
            sb.append("(").append(expand(pat, depth + 1)).append(")")
          case None =>
            sb.append("(?:").append(expand(pat, depth + 1)).append(")")
        }
        last = m.end
      }
      sb.append(p.substring(last))
      sb.toString
    }
    CompiledGrok(expand(pattern, 0), fields.toSeq)
  }
}
