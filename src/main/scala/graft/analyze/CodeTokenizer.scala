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

  // Precompiled (String.replaceAll/split would recompile per call —
  // measurable at 10^5 docs/s/core, fatal at 10^12 docs).
  private val CamelP   = java.util.regex.Pattern.compile(Camel)
  private val AcronymP = java.util.regex.Pattern.compile(Acronym)
  private val NonWordP = java.util.regex.Pattern.compile(NonWord)

  /** Pure-Scala tokenizer; canonical semantics. ASCII input (the
    * overwhelming case for code and the synthetic corpora) takes a
    * single-pass scanner — the regex pipeline is the ingest's dominant
    * CPU, and two `replaceAll` passes plus a regex split cost several
    * times a hand scan. Any char >= 0x80 falls back to the regex path:
    * unicode lowercasing can map INTO [a-z0-9] (e.g. the Kelvin sign
    * U+212A lowercases to 'k', Turkish 'İ' to "i"+combining-dot), which
    * a byte-class scanner cannot see. Scanner/regex equality is
    * property-tested in TokenizerSpec. */
  def tokenize(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    // single traversal: the scanner itself bails (null) on the first
    // char >= 0x80 — a separate ASCII pre-pass would walk every
    // document twice on the ingest hot path
    val fast = tokenizeAscii(s)
    if (fast ne null) fast else tokenizeRegex(s)
  }

  /** The reference regex pipeline (canonical semantics; unicode path). */
  private[analyze] def tokenizeRegex(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val boundary = AcronymP.matcher(
      CamelP.matcher(s).replaceAll("$1 $2")).replaceAll("$1 $2")
      .toLowerCase(java.util.Locale.ROOT)
    NonWordP.split(boundary).filter(keep)
  }

  /** Single-pass ASCII twin of [[tokenizeRegex]]. Boundary rules derive
    * from the two ordered regex passes: (camel) a token breaks between
    * [a-z0-9] and [A-Z]; (acronym) inside an UPPERCASE run followed by
    * a lowercase letter, the break lands before the run's LAST upper —
    * both passes' left-to-right non-overlapping matches reduce to
    * exactly these local conditions because a match's trailing char
    * class can never be the next match's leading char class.
    * Returns NULL on the first char >= 0x80 (caller falls back to the
    * regex path — fused so ASCII documents are walked exactly once). */
  private[analyze] def tokenizeAscii(s: String): Array[String] = {
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    val sb = new java.lang.StringBuilder(16)
    @inline def lowerDigit(c: Char) = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    @inline def upper(c: Char) = c >= 'A' && c <= 'Z'
    @inline def lower(c: Char) = c >= 'a' && c <= 'z'
    def flush(): Unit = {
      if (sb.length > 0) {
        val t = sb.toString
        if (keep(t)) out += t
        sb.setLength(0)
      }
    }
    var i = 0
    var prev: Char = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 0x80) return null // unicode: caller takes the regex path
      if (!lowerDigit(c) && !upper(c)) flush() // separator
      else {
        if (sb.length > 0 && upper(c) &&
            (lowerDigit(prev) || // camel: [a-z0-9] | [A-Z]
              (upper(prev) && i + 1 < n && lower(s.charAt(i + 1))))) // acronym
          flush()
        sb.append(if (upper(c)) (c + 32).toChar else c)
      }
      prev = c
      i += 1
    }
    flush()
    out.result()
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

  /** Hot-path Column form: a native Catalyst Expression invoking
    * [[tokenize]] once per row — no per-token interpreted lambda, no
    * per-call pattern compilation. Semantics identical to [[tokensCol]]
    * (property-tested); this is what the engine build uses. */
  def tokensColFast(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CodeTokenizeExpr(GraftColumnBridge.toExpression(c)))
  }

  /** Count of `arr` elements in `set` — native twin of
    * `size(filter(arr, t => t.isin(set: _*))).cast("long")`; see
    * [[CountInSetExpr]]. */
  def countInSet(arr: Column, set: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CountInSetExpr(GraftColumnBridge.toExpression(arr), set))
  }

  /** struct(doclen, pairs: array&lt;struct&lt;term, tf&gt;&gt;) in one eval —
    * see [[CodeTokenizeTfExpr]]. */
  def tokenTfCol(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CodeTokenizeTfExpr(GraftColumnBridge.toExpression(c)))
  }

  /** struct(doclen, pairs: array&lt;struct&lt;term, tf, positions&gt;&gt;) in one
    * eval — see [[CodeTokenizePosExpr]]. Positions index the KEPT token
    * sequence (adjacency is defined after stopword/length filtering,
    * exactly like the shingle-based phrase semantics and the DuckDB
    * oracle's token arrays). */
  def tokenPosCol(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CodeTokenizePosExpr(GraftColumnBridge.toExpression(c)))
  }

  /** DuckDB SQL fragment producing the same token array from column
    * expression `col`. Kept mechanically in sync with [[tokenize]]. */
  def sqlTokenArray(col: String): String =
    s"list_filter(regexp_split_to_array(lower(regexp_replace(regexp_replace($col, " +
      s"'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')), " +
      s"'[^a-z0-9]+'), tk -> length(tk) BETWEEN $MinLen AND $MaxLen " +
      s"AND NOT regexp_full_match(tk, '[0-9]+') AND tk NOT IN (${Stopwords.map(w => s"'$w'").mkString(",")}))"
}

/** Native tokenizer expression (preference (b) in the custom-operator
  * ladder): single eval call per row into the shared pure tokenizer.
  * CodegenFallback — the row-level virtual call is already far cheaper
  * than an interpreted per-element higher-order filter. */
case class CodeTokenizeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val toks = CodeTokenizer.tokenize(v.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CodeTokenizeExpr = copy(c)
}

/** Tokenize + per-document term frequencies in ONE eval:
  * struct(doclen, array(struct(term, tf))), pairs in ascending term
  * order. Eliminates the corpus-wide (term, docId) hash aggregation —
  * tf is a per-document quantity and never needs a shuffle. */
case class CodeTokenizeTfExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = StructType(Seq(
    StructField("doclen", LongType, nullable = false),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val toks = CodeTokenizer.tokenize(v.toString)
    val counts = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val pairs = new Array[Any](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      pairs(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    InternalRow(toks.length.toLong, new GenericArrayData(pairs))
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CodeTokenizeTfExpr = copy(c)
}

/** Tokenize + per-document POSITIONAL postings in one eval:
  * struct(doclen, array(struct(term, tf, positions))), pairs in
  * ascending term order, positions ascending indices into the kept
  * token sequence. The positional twin of [[CodeTokenizeTfExpr]] — one
  * pass, no shuffle; tf == positions.length by construction. */
case class CodeTokenizePosExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = StructType(Seq(
    StructField("doclen", LongType, nullable = false),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("positions", ArrayType(IntegerType, containsNull = false),
        nullable = false))), containsNull = false),
      nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val toks = CodeTokenizer.tokenize(v.toString)
    val posByTerm = new java.util.TreeMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < toks.length) {
      posByTerm.computeIfAbsent(toks(i), _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    val pairs = new Array[Any](posByTerm.size)
    var j = 0
    val it = posByTerm.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ps = e.getValue
      val parr = new Array[Any](ps.length)
      var k = 0
      while (k < ps.length) { parr(k) = ps(k); k += 1 }
      pairs(j) = InternalRow(UTF8String.fromString(e.getKey), ps.length.toLong,
        new GenericArrayData(parr))
      j += 1
    }
    InternalRow(toks.length.toLong, new GenericArrayData(pairs))
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CodeTokenizePosExpr = copy(c)
}

/** Count of array elements contained in a fixed string set — the
  * native twin of `size(filter(arr, t => t.isin(set: _*)))` (the
  * higher-order filter runs an interpreted lambda per element; at
  * corpus scale that inner loop dominates the text-quality and lang-id
  * scans — same rationale as [[ShinglesExpr]]). Null elements are not
  * counted (isin(null) is null, which filter drops); a null array
  * yields null (size(null) under non-legacy semantics, matched by the
  * UnaryExpression null contract). Equality with the HOF form is
  * property-tested in TokenizerSpec. */
case class CountInSetExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
                          set: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = LongType

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && lookup.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CountInSetExpr =
    copy(child = c)
}

/** Word n-gram shingles over an array<string> column — native sliding
  * window (the equivalent transform/sequence/element_at higher-order
  * expression is interpreted per element and ~100x slower). */
case class ShinglesExpr(child: org.apache.spark.sql.catalyst.expressions.Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): ShinglesExpr = copy(child = c)
}
