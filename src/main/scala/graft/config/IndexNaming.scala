package graft.config

/** Elasticsearch index-name rules, re-implemented client-side exactly as
  * the reference does for its pre-flight settings validation
  * (/root/reference/Validators/MigrationSettingsValidator.cs:114-144):
  * lowercase only; not `.`/`..`; no leading `-`, `_`, `+`; no
  * backslash, slash, asterisk, `?`, quote, angle brackets, pipe,
  * space, comma or `#`; at most 255 chars. The engine applies them to the
  * index/table name (the basename of an index directory) in the CLI
  * pre-flight. */
object IndexNaming {

  private val InvalidChars: Set[Char] =
    Set('\\', '/', '*', '?', '"', '<', '>', '|', ' ', ',', '#')

  /** Violated rules (empty = valid name). */
  def violations(name: String): Seq[String] = {
    if (name == null || name.isEmpty) return Seq("name must not be empty")
    val b = Seq.newBuilder[String]
    if (name.length > 255) b += "longer than 255 characters"
    if (name == "." || name == "..") b += "must not be '.' or '..'"
    if (name.startsWith("-") || name.startsWith("_") || name.startsWith("+"))
      b += "must not start with '-', '_' or '+'"
    if (name.exists(InvalidChars.contains))
      b += "contains an invalid character (\\/*?\"<>| ,#)"
    if (name.exists(_.isUpper)) b += "must be lowercase"
    b.result()
  }

  def valid(name: String): Boolean = violations(name).isEmpty
}
