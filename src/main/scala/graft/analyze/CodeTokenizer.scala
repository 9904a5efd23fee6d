package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-aware analyzer — the from-scratch replacement for the
  * Elasticsearch analyzer the reference delegates to (the reference is an
  * ES client, not an engine: /root/reference/Services/ElasticSearchService.cs:150-229).
  *
  * Pipeline (identical in all three implementations below):
  *   1. camelCase boundary split:  ([a-z0-9])([A-Z])   -> "$1 $2"
  *   2. acronym boundary split:    ([A-Z]+)([A-Z][a-z]) -> "$1 $2"
  *   3. lowercase (locale-independent)
  *   4. split on runs of [^a-z0-9]  (this also handles snake_case, paths,
  *      punctuation, unicode)
  *   5. keep tokens with 2..64 chars, not purely numeric, not stopwords
  *
  * Three provably-equivalent implementations are exposed:
  *   - [[tokenize]]   pure Scala (oracle + driver-side query analysis)
  *   - [[tokensCol]]  Catalyst Column expression (whole-stage codegen'd;
  *                    the engine's hot path — no UDF, no closure)
  *   - [[sqlTokenArray]] ANSI-ish SQL fragment for the DuckDB oracle
  * Equivalence of the first two is property-tested in TokenizerSpec.
  */
object CodeTokenizer {

  /** Fixed stopword set (code + English filler). Single-char tokens are
    * already dropped by the length filter. */
  val Stopwords: Seq[String] = Seq(
    "the", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "as", "at", "by", "be", "this", "that", "with", "from")

  private val StopSet: Set[String] = Stopwords.toSet

  val MinLen = 2
  val MaxLen = 64

  private val Camel   = "([a-z0-9])([A-Z])"
  private val Acronym = "([A-Z]+)([A-Z][a-z])"
  private val NonWord = "[^a-z0-9]+"

  /** Pure-Scala tokenizer; canonical semantics. */
  def tokenize(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val boundary = s
      .replaceAll(Camel, "$1 $2")
      .replaceAll(Acronym, "$1 $2")
      .toLowerCase(java.util.Locale.ROOT)
    boundary
      .split(NonWord)
      .filter(keep)
  }

  @inline def keep(t: String): Boolean =
    t.length >= MinLen && t.length <= MaxLen &&
      !t.forall(c => c >= '0' && c <= '9') &&
      !StopSet.contains(t)

  /** Analyzed, deduplicated, sorted query terms (ES `match`-style
    * disjunction over unique terms). */
  def queryTerms(text: String): Seq[String] =
    tokenize(text).distinct.sorted.toSeq

  /** Catalyst Column form: array&lt;string&gt; of kept tokens. Pure built-in
    * functions — stays inside WholeStageCodegen, no UDF. */
  def tokensCol(c: Column): Column = {
    val boundary =
      lower(regexp_replace(regexp_replace(c, Camel, "$1 $2"), Acronym, "$1 $2"))
    val parts = split(boundary, NonWord)
    filter(parts, t =>
      length(t) >= lit(MinLen) && length(t) <= lit(MaxLen) &&
        !t.rlike("^[0-9]+$") && !t.isin(Stopwords: _*))
  }

  /** DuckDB SQL fragment producing the same token array from column
    * expression `col`. Kept mechanically in sync with [[tokenize]]. */
  def sqlTokenArray(col: String): String =
    s"list_filter(regexp_split_to_array(lower(regexp_replace(regexp_replace($col, " +
      s"'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')), " +
      s"'[^a-z0-9]+'), tk -> length(tk) BETWEEN $MinLen AND $MaxLen " +
      s"AND NOT regexp_full_match(tk, '[0-9]+') AND tk NOT IN (${Stopwords.map(w => s"'$w'").mkString(",")}))"
}
