package graft.accesslog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference tool's own data model and ETL semantics, re-expressed
  * as one declarative Spark pipeline (SURVEY.md §1-§2, Layer A).
  *
  * Column mapping: /root/reference/Services/CSVService.cs:21-45.
  * Coercion rules: /root/reference/Services/CSVService.cs:479-633 (§1.3).
  * Hard validators: /root/reference/Validators/AccessLogValidator.cs:19-246.
  * Soft warnings:  /root/reference/Services/ValidationService.cs:141-201.
  */
object AccessLog {

  /** CSV header -> canonical field (the reference's ColumnMappings,
    * CSVService.cs:21-45; headers are matched case-insensitively). */
  val ColumnMappings: Seq[(String, String)] = Seq(
    "_id" -> "elasticsearch_id",
    "_index" -> "elasticsearch_index",
    "_score" -> "elasticsearch_score",
    "accesslog" -> "access_log_flag",
    "areaname" -> "area_name",
    "eventid" -> "event_id",
    "eventname" -> "event_name",
    "gatename" -> "gate_name",
    "gkstype" -> "gks_type",
    "image" -> "image",
    "ip" -> "ip",
    "isaccreditation" -> "is_accreditation",
    "nationalityid" -> "nationality_id",
    "passageduration" -> "passage_duration",
    "port" -> "port",
    "readername" -> "reader_name",
    "result" -> "result",
    "serialnumber" -> "serial_number",
    "stadiumid" -> "stadium_id",
    "timestamp" -> "timestamp",
    "transactionid" -> "transaction_id",
    "transactiontime" -> "transaction_time")

  /** Required minimum header set (CSVService.cs:97-104). */
  val RequiredHeaders: Set[String] = Set("_id", "accesslog", "eventid", "timestamp")

  val GksTypes: Seq[String] = Seq("TELPO", "HIKVISION", "DAHUA", "ZKTECO", "SUPREMA")
  val Results: Seq[String] = Seq("PASSED", "FAILED", "DENIED", "ERROR", "TIMEOUT", "BLOCKED")

  // --- lenient coercion battery (CSVService.cs:479-633) -------------------------

  /** ""/whitespace/"null" (case-insensitive) -> null (CSVService.cs:481-482). */
  def nullNorm(c: Column): Column =
    when(trim(c) === "" || lower(trim(c)) === "null", lit(null).cast("string"))
      .otherwise(trim(c))

  /** "true"/"1" -> true, "false"/"0" -> false, else null
    * (CSVService.cs:485-488,527-533). */
  def boolCoerce(c: Column): Column = {
    val v = lower(nullNorm(c))
    when(v.isin("true", "1"), lit(true))
      .when(v.isin("false", "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Multi-format timestamp over a normalized string column NAME:
    * ISO-8601 / common patterns, then Unix epoch with the >1e12
    * millis-vs-seconds heuristic (CSVService.cs:586-630). Null on
    * failure, like the reference's TryParse chain. */
  def timestampCoerce(name: String): Column = {
    val v = col(name)
    val epoch = expr(s"try_cast($name as bigint)")
    val fromEpoch = when(epoch > 1000000000000L, timestamp_millis(epoch))
      .otherwise(timestamp_seconds(epoch))
    val patterns = Seq(
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX", "yyyy-MM-dd'T'HH:mm:ssXXX",
      "yyyy-MM-dd'T'HH:mm:ss.SSS", "yyyy-MM-dd'T'HH:mm:ss",
      "yyyy-MM-dd HH:mm:ss.SSS", "yyyy-MM-dd HH:mm:ss",
      "yyyy-MM-dd", "dd/MM/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm:ss")
    val parsed = patterns.map(p => try_to_timestamp(v, lit(p)))
    coalesce((parsed :+ when(epoch.isNotNull, fromEpoch)): _*)
  }

  /** Apply mapping + coercion to a raw all-string CSV DataFrame whose
    * columns are the original headers. Unknown columns are tolerated and
    * dropped (CSVService.cs:173-174); the only row-fatal rule is a
    * missing _id (CSVService.cs:467-471). Two-step select: normalize
    * strings under canonical names, then lenient-cast (try_cast =
    * null-on-failure). */
  def coerce(raw: DataFrame): DataFrame = {
    val present = raw.columns.map(h => h.toLowerCase -> h).toMap
    def in(lower: String): Column =
      present.get(lower).map(col).getOrElse(lit(null).cast("string"))
    val strs = raw.select(ColumnMappings.map { case (h, field) =>
      nullNorm(in(h)).as(field) }: _*)
    strs.select(
      col("elasticsearch_id"),
      col("elasticsearch_index"),
      expr("try_cast(elasticsearch_score as decimal(10,2))").as("elasticsearch_score"),
      coalesce(boolCoerce(col("access_log_flag")), lit(false)).as("access_log_flag"),
      col("area_name"),
      expr("try_cast(event_id as int)").as("event_id"),
      col("event_name"),
      col("gate_name"),
      col("gks_type"),
      col("image"),
      col("ip"),
      coalesce(boolCoerce(col("is_accreditation")), lit(false)).as("is_accreditation"),
      col("nationality_id"),
      expr("try_cast(passage_duration as decimal(10,2))").as("passage_duration"),
      expr("try_cast(port as int)").as("port"),
      // raw string kept for reference-parity validation (BeValidPort
      // rejects non-numeric strings; try_cast would silently null them)
      col("port").as("port_raw"),
      col("reader_name"),
      col("result"),
      col("serial_number"),
      expr("try_cast(stadium_id as int)").as("stadium_id"),
      timestampCoerce("timestamp").as("timestamp"),
      expr("try_cast(transaction_id as int)").as("transaction_id"),
      timestampCoerce("transaction_time").as("transaction_time"),
      current_timestamp().as("created_at"))
      // the single row-fatal rule
      .filter(col("elasticsearch_id").isNotNull)
  }

  /** Read + parse an AccessLog CSV (PERMISSIVE, header-driven — S1/S2). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    coerce(rawCsv(spark, path))

  private def rawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S5/P4: ES-scroll-shaped source — newline-delimited JSON documents
    * carrying the reference's ES field names (the `_source` payload of
    * an accesslog hit, ElasticSearchService.cs:267-278). Read with
    * primitives-as-string so the SAME lenient coercion battery used for
    * CSV applies (field names match case-insensitively through
    * ColumnMappings; unknown fields tolerated and dropped; the only
    * row-fatal rule is a missing _id).
    *
    * @param fields caller-supplied key set (the ES-mapping analogue —
    *   the reference reads `_source` fields it KNOWS from the mapping,
    *   never inferring; ElasticSearchService.cs:267-278). When
    *   non-empty, the inference pre-pass is skipped entirely and the
    *   read is ONE scan of the source — the only shape that holds at
    *   100 TB, where the default's inference pass doubles ingest I/O.
    * @param inferSamplingRatio bound on the inference pre-pass when
    *   `fields` is empty: fraction of documents PARSED for the key set
    *   (Spark's JSON samplingRatio — partitions are still listed, but
    *   parse CPU drops proportionally). Default 1.0 = exact key set,
    *   two full passes; exploration-scale only. A key that appears in
    *   no sampled document reads as null for those docs — same
    *   keep-first semantics as a casing-dedup miss. */
  def readEsJson(spark: SparkSession, path: String, fields: Seq[String] = Nil,
                 inferSamplingRatio: Double = 1.0): DataFrame = {
    // Two-step read. 1) Infer the key set under scoped caseSensitive=true
    // (keys differing only in case across documents — raw _source has no
    // single header row — would otherwise reject the read outright).
    val csKey = "spark.sql.caseSensitive"
    val csOld = spark.conf.get(csKey)
    val inferredNames = if (fields.nonEmpty) fields else try {
      spark.conf.set(csKey, "true")
      spark.read.option("mode", "PERMISSIVE")
        .option("samplingRatio", inferSamplingRatio)
        .json(path).schema.fieldNames.toSeq
    } finally spark.conf.set(csKey, csOld)
    // 2) Re-read with an explicit all-string schema keeping the FIRST
    // seen casing of each key (JSON field matching is case-sensitive at
    // parse time; coerce() maps the kept names case-insensitively, and
    // a document using a different casing for a deduped key contributes
    // null for it — keep-first semantics). Every scalar arrives as a
    // string for the shared lenient battery, and an object/array value
    // (legitimate in ES documents) is captured as its raw JSON text
    // instead of an AnalysisException killing the read.
    val names = inferredNames.foldLeft(Vector.empty[String]) { (acc, n) =>
      if (acc.exists(_.equalsIgnoreCase(n))) acc else acc :+ n
    }
    val schema = StructType(names.map(StructField(_, StringType)))
    val raw = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    // ES may wrap any _source field in a JSON array; the reference takes
    // the FIRST element of a non-empty array and null for an empty one
    // (GetFirstArrayValue, ElasticSearchService.cs:267-278). An array
    // value arrived above as its raw JSON text, so the rule here is a
    // UNIFORM TEXT rule: any value whose text parses as a JSON array
    // unwraps to element 1 (JSON scalars of any type render as their
    // text, matching ToObject<T>'s conversion); text that fails the
    // array parse stays as-is. Documented divergence: after the
    // all-string read, a real JSON array and a STRING whose content is
    // valid array syntax (e.g. "[1,2]") are indistinguishable — the
    // reference keeps the latter verbatim, this reader unwraps both.
    // The DuckDB oracle implements the same text rule, so the two
    // sides cannot drift (fixture row pins the case). ES metadata
    // (`_id`/`_index`/`_score`) uses direct token access in the
    // reference — never unwrapped.
    val unwrapped = raw.select(names.map { nm =>
      val c = col(s"`$nm`")
      if (nm.startsWith("_")) c.as(nm)
      else {
        val arr = from_json(c, ArrayType(StringType))
        when(c.rlike("^\\s*\\[") && arr.isNotNull, try_element_at(arr, lit(1)))
          .otherwise(c).as(nm)
      }
    }: _*)
    coerce(unwrapped)
  }

  /** S3: header probe — the required minimum header set must be present
    * (CSVService.cs:97-104); returns the missing headers. */
  def missingRequiredHeaders(headers: Seq[String]): Seq[String] = {
    val present = headers.map(_.toLowerCase).toSet
    RequiredHeaders.toSeq.sorted.filterNot(present.contains)
  }

  /** T6: error-rate circuit breaker (StopOnError — CSVService.cs:302-305):
    * count structurally corrupt lines plus rows killed by the fatal
    * missing-_id rule; abort the ingest when the budget is exceeded.
    * Also enforces the S3 header probe up front. */
  def readCsvWithErrorBudget(spark: SparkSession, path: String,
                             maxErrors: Long = 10): DataFrame = {
    val raw0 = rawCsv(spark, path)
    val missing = missingRequiredHeaders(raw0.columns.toSeq)
    require(missing.isEmpty, s"missing required headers: ${missing.mkString(", ")}")
    // re-read with an explicit all-string schema + corrupt-record column
    // (PERMISSIVE mode routes malformed lines there instead of dropping)
    val fields = raw0.columns.map(c => StructField(c, StringType)) :+
      StructField("_corrupt_record", StringType)
    val raw = spark.read
      .option("header", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(StructType(fields))
      .csv(path)
      .cache()
    try {
      val corrupt = raw.filter(col("_corrupt_record").isNotNull).count()
      val idDead = raw.filter(col("_corrupt_record").isNull)
        .filter(nullNorm(col("_id")).isNull).count()
      val errors = corrupt + idDead
      if (errors > maxErrors)
        throw new IllegalStateException(
          s"error budget exceeded: $errors parse errors > $maxErrors (StopOnError)")
      coerce(raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"))
        .localCheckpoint(eager = true)
    } finally raw.unpersist()
  }

  // --- hard-constraint battery (AccessLogValidator.cs:19-138) -------------------

  /** Turkish national ID checksum, expression-only (no UDF):
    * 11 digits, d1 != 0,
    * d10 = ((sum of odd-position digits)*7 - sum of even-position digits) % 10,
    * d11 = (sum of first 10 digits) % 10. (AccessLogValidator.cs:199-218)
    * `%` (not pmod) mirrors C#'s signed remainder: when oddSum*7 <
    * evenSum the reference's check digit is negative and can never
    * equal d10 — such IDs must be rejected, exactly as the reference
    * rejects them. */
  def tcChecksumOk(c: Column): Column = {
    def d(i: Int): Column = substring(c, i, 1).cast("int")
    val oddSum = d(1) + d(3) + d(5) + d(7) + d(9)
    val evenSum = d(2) + d(4) + d(6) + d(8)
    val d10 = (oddSum * 7 - evenSum) % 10
    val d11 = (oddSum + evenSum + d(10)) % 10
    c.rlike("^[0-9]{11}$") && d(1) =!= 0 && d(10) === d10 && d(11) === d11
  }

  /** Nationality ID rule (AccessLogValidator.cs:179-193): the Turkish
    * checksum applies ONLY to 11-digit values; anything else passes on a
    * lenient 5..50 length envelope (other-country formats). */
  def nationalityIdOk(c: Column): Column =
    when(c.rlike("^[0-9]{11}$"), tcChecksumOk(c))
      .otherwise(length(c).between(5, 50))

  private val V4Body =
    "((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"

  val Ipv4Pattern = s"^$V4Body$$"

  /** IPv6 (full, ::-compressed, IPv4-mapped/embedded tails, optional
    * %zone suffix on any form) — mirrors what
    * System.Net.IPAddress.TryParse accepts
    * (AccessLogValidator.cs:168-174) except .NET's legacy IPv4
    * shorthand ("1" == 0.0.0.1), which we deliberately reject. */
  val Ipv6Pattern: String = {
    val h = "[0-9A-Fa-f]{1,4}"
    val body =
      s"(($h:){7}$h|($h:){1,7}:|($h:){1,6}:$h|($h:){1,5}(:$h){1,2}|" +
        s"($h:){1,4}(:$h){1,3}|($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|" +
        s"$h:((:$h){1,6})|:((:$h){1,7}|:)|" +
        s"($h:){6}$V4Body|($h:){1,5}:$V4Body|" + // full + end-compressed v4 tails
        // mid-compressed v4 tails: explicit groups + v4's 2 must stay <= 7
        s"($h:)(:$h){1,4}:$V4Body|($h:){2}(:$h){1,3}:$V4Body|" +
        s"($h:){3}(:$h){1,2}:$V4Body|($h:){4}(:$h):$V4Body|" +
        s"::($h:){0,5}$V4Body)"                  // ::-leading v4 tail (incl. ::ffff:v4)
    s"^$body(%[0-9A-Za-z._\\-]+)?$$"
  }

  /** Real IP validation, IPv4 and IPv6 (no colon-garbage passes). */
  def ipOk(c: Column): Column = c.rlike(Ipv4Pattern) || c.rlike(Ipv6Pattern)

  /** (rule name, violated-when-false predicate); null passes every rule
    * except the explicit non-null ones — the reference validates
    * only present values (NotEmpty is on _id alone). */
  def hardRules: Seq[(String, Column)] = {
    def okOrNull(c: Column, p: Column): Column = c.isNull || p
    val id = col("elasticsearch_id")
    Seq(
      "id_required" -> (id.isNotNull && length(id) > 0),
      "area_name_len" -> okOrNull(col("area_name"), length(col("area_name")) <= 500),
      "event_name_len" -> okOrNull(col("event_name"), length(col("event_name")) <= 500),
      "gate_name_len" -> okOrNull(col("gate_name"), length(col("gate_name")) <= 100),
      "reader_name_len" -> okOrNull(col("reader_name"), length(col("reader_name")) <= 100),
      "serial_number_len" -> okOrNull(col("serial_number"), length(col("serial_number")) <= 100),
      "image_len" -> okOrNull(col("image"), length(col("image")) <= 1000),
      "ip_len" -> okOrNull(col("ip"), length(col("ip")) <= 45),
      "gks_type_enum" -> okOrNull(col("gks_type"), upper(col("gks_type")).isin(GksTypes: _*)),
      "result_enum" -> okOrNull(col("result"), upper(col("result")).isin(Results: _*)),
      "event_id_pos" -> okOrNull(col("event_id"), col("event_id") > 0),
      "stadium_id_pos" -> okOrNull(col("stadium_id"), col("stadium_id") > 0),
      "transaction_id_pos" -> okOrNull(col("transaction_id"), col("transaction_id") > 0),
      "passage_duration_range" -> okOrNull(col("passage_duration"),
        col("passage_duration").between(0, 3600)),
      // the reference validates Port as a STRING (parse + range —
      // BeValidPort, AccessLogValidator.cs:223-231): a non-numeric port
      // is a violation, not a silent null, so the rule runs on the
      // pre-coercion string column. No length cap: C# int.TryParse
      // accepts arbitrarily long leading-zero numerics ("00000000080"
      // is port 80) and try_cast already nulls on int overflow exactly
      // where int.TryParse fails.
      "port_range" -> okOrNull(col("port_raw"),
        expr("try_cast(port_raw as int)").isNotNull && // non-numeric = violation
          expr("try_cast(port_raw as int)").between(1, 65535)),
      "image_ext" -> okOrNull(col("image"),
        lower(col("image")).rlike("\\.(jpg|jpeg|png|bmp|gif)$")),
      "ip_format" -> okOrNull(col("ip"), ipOk(col("ip"))),
      "nationality_id_checksum" -> okOrNull(col("nationality_id"),
        nationalityIdOk(col("nationality_id"))),
      "timestamp_future" -> okOrNull(col("timestamp"),
        col("timestamp") <= current_timestamp() + expr("INTERVAL 1 DAY")),
      "transaction_time_future" -> okOrNull(col("transaction_time"),
        col("transaction_time") <= current_timestamp() + expr("INTERVAL 1 DAY")))
  }

  /** errors: array<string> of violated hard rules (empty = valid). */
  def errorsCol: Column =
    filter(array(hardRules.map { case (name, ok) =>
      when(!ok, lit(name)) }: _*), e => e.isNotNull)

  // --- soft warnings (ValidationService.cs:141-201) ------------------------------

  def warningRules: Seq[(String, Column)] = Seq(
    "null_area_name" -> col("area_name").isNull,
    "null_event_name" -> col("event_name").isNull,
    "null_gate_name" -> col("gate_name").isNull,
    "null_ip" -> col("ip").isNull,
    "null_result" -> col("result").isNull,
    "null_timestamp" -> col("timestamp").isNull,
    "null_gks_type" -> col("gks_type").isNull,
    "long_passage" -> (col("passage_duration") > 300),
    "time_drift_gt_60m" -> (abs(unix_timestamp(col("transaction_time")) -
      unix_timestamp(col("timestamp"))) > 3600),
    "unusual_port" -> (col("port") < 1024),
    "ip_not_v4" -> (col("ip").isNotNull && !col("ip").rlike(Ipv4Pattern)))

  def warningsCol: Column =
    filter(array(warningRules.map { case (name, w) =>
      when(coalesce(w, lit(false)), lit(name)) }: _*), e => e.isNotNull)

  /** Validated frame: original columns + errors + warnings + is_valid. */
  def validate(df: DataFrame): DataFrame =
    df.withColumn("errors", errorsCol)
      .withColumn("warnings", warningsCol)
      .withColumn("is_valid", size(col("errors")) === 0)

  // --- batch stats (ValidationService.cs:214-239, A3-A5) -------------------------

  /** The four batch counters over a [[validate]]d frame — shared by
    * [[batchStats]] and the CLI `migrate` verb's `observe()` (defined
    * once so the two surfaces cannot drift). */
  def batchCounters: Seq[Column] = Seq(
    count(lit(1)).as("total"),
    count(when(col("is_valid"), 1)).as("valid"),
    count(when(!col("is_valid"), 1)).as("invalid"),
    count(when(size(col("warnings")) > 0, 1)).as("with_warnings"))

  /** One-row stats frame: totals, ratios, and the top-10 message
    * histogram as array<struct<msg,cnt>>. */
  def batchStats(validated: DataFrame): DataFrame = {
    val agg1 = validated.agg(batchCounters.head, batchCounters.tail: _*)
      .withColumn("valid_pct", lit(100.0) * col("valid") / col("total"))
      .withColumn("invalid_pct", lit(100.0) * col("invalid") / col("total"))
      .withColumn("warning_pct", lit(100.0) * col("with_warnings") / col("total"))
    val top = validated
      .select(explode(concat(col("errors"), col("warnings"))).as("msg"))
      .groupBy("msg").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("msg")).limit(10)
      .agg(collect_list(struct(col("msg"), col("cnt"))).as("top_messages"))
    agg1.crossJoin(top)
  }

  /** J1: dedup by elasticsearch_id keeping the newest row
    * (PostgreSQLService.cs:197-222 as a window, not a self-join). */
  def dedupLatest(df: DataFrame, orderCol: Column): DataFrame = {
    val w = Window.partitionBy("elasticsearch_id").orderBy(orderCol.desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
