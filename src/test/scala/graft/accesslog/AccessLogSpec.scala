package graft.accesslog

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** FIXTURES.md §3: one row per reference semantics rule, asserted
  * against the declarative pipeline. */
class AccessLogSpec extends SparkSuite {

  private val header =
    "_id,_index,_score,accessLog,areaName,eventId,eventName,gateName,gksType,image,ip," +
      "isAccreditation,nationalityId,passageDuration,port,readerName,result,serialNumber," +
      "stadiumId,timestamp,transactionId,transactionTime"

  // helper: row with defaults, overridable by position name
  private def row(overrides: (String, String)*): String = {
    val base = scala.collection.mutable.LinkedHashMap(
      "_id" -> "id1", "_index" -> "logs", "_score" -> "1.50", "accessLog" -> "true",
      "areaName" -> "North", "eventId" -> "7", "eventName" -> "Match", "gateName" -> "G1",
      "gksType" -> "TELPO", "image" -> "cam1.jpg", "ip" -> "10.0.0.1",
      "isAccreditation" -> "0", "nationalityId" -> "10000000146", "passageDuration" -> "12.50",
      "port" -> "6666", "readerName" -> "R1", "result" -> "PASSED", "serialNumber" -> "SN1",
      "stadiumId" -> "3", "timestamp" -> "2024-05-01T10:00:00", "transactionId" -> "900",
      "transactionTime" -> "2024-05-01T10:00:30")
    overrides.foreach { case (k, v) => base(k) = v }
    base.values.mkString(",")
  }

  private def parse(rows: String*): org.apache.spark.sql.DataFrame = {
    val f = Files.createTempFile("accesslog_", ".csv")
    Files.writeString(f, (header +: rows).mkString("\n"))
    AccessLog.readCsv(spark, f.toString)
  }

  test("happy path: all 22 columns mapped and coerced") {
    val df = parse(row()).cache()
    val r = df.head()
    assert(r.getAs[String]("elasticsearch_id") === "id1")
    assert(r.getAs[java.math.BigDecimal]("elasticsearch_score").doubleValue() === 1.5)
    assert(r.getAs[Boolean]("access_log_flag") === true)
    assert(r.getAs[Boolean]("is_accreditation") === false)
    assert(r.getAs[Int]("event_id") === 7)
    assert(r.getAs[Timestamp]("timestamp").toString.startsWith("2024-05-01 10:00:00"))
    val v = AccessLog.validate(df).head()
    assert(v.getAs[scala.collection.Seq[String]]("errors").isEmpty)
    assert(v.getAs[Boolean]("is_valid"))
  }

  test("null normalization: empty and literal null (any case)") {
    val r = parse(row("areaName" -> "", "eventName" -> "null", "gateName" -> "NULL")).head()
    assert(r.getAs[String]("area_name") === null)
    assert(r.getAs[String]("event_name") === null)
    assert(r.getAs[String]("gate_name") === null)
  }

  test("boolean coercion: 1/0/true/false; junk -> default false") {
    val rs = parse(
      row("_id" -> "a", "accessLog" -> "1", "isAccreditation" -> "false"),
      row("_id" -> "b", "accessLog" -> "junk", "isAccreditation" -> "TRUE"))
      .orderBy("elasticsearch_id").collect()
    assert(rs(0).getAs[Boolean]("access_log_flag") === true)
    assert(rs(0).getAs[Boolean]("is_accreditation") === false)
    assert(rs(1).getAs[Boolean]("access_log_flag") === false) // lenient default
    assert(rs(1).getAs[Boolean]("is_accreditation") === true)
  }

  test("timestamp formats: ISO, space-separated, epoch seconds, epoch millis heuristic") {
    val rs = parse(
      row("_id" -> "a", "timestamp" -> "2024-05-01T10:00:00"),
      row("_id" -> "b", "timestamp" -> "2024-05-01 10:00:00"),
      row("_id" -> "c", "timestamp" -> "1714557600"),          // seconds
      row("_id" -> "d", "timestamp" -> "1714557600000"),       // millis (>1e12)
      row("_id" -> "e", "timestamp" -> "not-a-date"))
      .orderBy("elasticsearch_id").collect()
    val ts = rs.map(_.getAs[Timestamp]("timestamp"))
    assert(ts(0) !== null); assert(ts(1) !== null)
    assert(ts(2) === ts(3), "seconds and millis forms must agree")
    assert(ts(4) === null, "unparseable -> null, row kept")
  }

  test("unparseable int/decimal -> null, row kept; missing _id -> row dropped") {
    val df = parse(
      row("_id" -> "a", "eventId" -> "abc", "passageDuration" -> "x.y"),
      row("_id" -> "", "eventId" -> "1"),
      row("_id" -> "null", "eventId" -> "2"))
    assert(df.count() === 1)
    val r = df.head()
    assert(r.getAs[Integer]("event_id") === null)
    assert(r.getAs[java.math.BigDecimal]("passage_duration") === null)
  }

  test("quoted field with embedded comma and escaped quotes") {
    val r = parse(row("areaName" -> "\"North, \"\"Upper\"\" Stand\"")).head()
    assert(r.getAs[String]("area_name") === "North, \"Upper\" Stand")
  }

  test("hard constraints: enum, range, format, checksum rejects") {
    val bad = AccessLog.validate(parse(row(
      "result" -> "INVALID_RESULT", "ip" -> "999.999.999.999",
      "passageDuration" -> "-5", "port" -> "99999",
      "eventName" -> ("x" * 600), "image" -> "cam1.exe",
      "nationalityId" -> "12345678901", "gksType" -> "NOKIA"))).head()
    val errs = bad.getAs[scala.collection.Seq[String]]("errors").toSet
    assert(errs === Set("result_enum", "ip_format", "passage_duration_range",
      "port_range", "event_name_len", "image_ext", "nationality_id_checksum",
      "gks_type_enum"))
    assert(!bad.getAs[Boolean]("is_valid"))
  }

  test("Turkish ID checksum: valid vs invalid") {
    val rs = AccessLog.validate(parse(
      row("_id" -> "a", "nationalityId" -> "10000000146"),  // valid checksum
      row("_id" -> "b", "nationalityId" -> "10000000147"))) // broken check digit
      .orderBy("elasticsearch_id").collect()
    assert(!rs(0).getAs[scala.collection.Seq[String]]("errors").contains("nationality_id_checksum"))
    assert(rs(1).getAs[scala.collection.Seq[String]]("errors").contains("nationality_id_checksum"))
  }

  test("ES JSON source: same mapping/coercion/validation battery as CSV") {
    val f = Files.createTempFile("accesslog_", ".ndjson")
    Files.writeString(f, Seq(
      // well-formed hit _source (ES-style field names, mixed case)
      """{"_id":"j1","_index":"logs","accessLog":"1","eventId":"7","timestamp":"2024-05-01T10:00:00","gksType":"telpo","ip":"2001:db8::1","port":"6666","nationalityId":"10000000146","result":"PASSED","unknownField":"dropped"}""",
      // junk types -> lenient nulls; missing _id -> row dropped
      """{"_id":"j2","eventId":"not-a-number","timestamp":"junk","port":"abc"}""",
      """{"eventId":"9","timestamp":"2024-05-01T10:00:00"}""",
      // array-wrapped scalars (legit ES shape) unwrap to their first
      // element (GetFirstArrayValue); object values still flatten to
      // JSON text; case-duplicate keys keep the first-seen column
      """{"_id":"j3","image":{"url":"a.jpg"},"result":["PASSED"],"Timestamp":"2024-05-01T11:00:00"}"""
    ).mkString("\n"))
    val df = AccessLog.readEsJson(spark, f.toString).orderBy("elasticsearch_id")
    val rows = df.collect()
    assert(rows.length === 3, "missing _id row must be dropped")
    val j1 = rows(0)
    assert(j1.getAs[String]("elasticsearch_id") === "j1")
    assert(j1.getAs[Boolean]("access_log_flag") === true)
    assert(j1.getAs[Int]("event_id") === 7)
    assert(j1.getAs[String]("gks_type") === "telpo")
    val j2 = rows(1)
    assert(j2.getAs[Any]("event_id") === null, "junk int coerces to null")
    assert(j2.getAs[Any]("timestamp") === null, "junk ts coerces to null")
    val j3 = rows(2)
    assert(j3.getAs[String]("image").contains("a.jpg"), "object field flattens to JSON text")
    assert(j3.getAs[String]("result") === "PASSED", "array field unwraps to first element")
    // validation battery applies identically: j1 clean, j2 flags port,
    // j3's unwrapped result VALIDATES CLEAN (the reference passes
    // {"result":["PASSED"]}) while its object-valued image still fails
    // its format rule
    val v = AccessLog.validate(df).orderBy("elasticsearch_id").collect()
    assert(v(0).getAs[scala.collection.Seq[String]]("errors").isEmpty)
    assert(v(1).getAs[scala.collection.Seq[String]]("errors").toSet === Set("port_range"))
    val j3errs = v(2).getAs[scala.collection.Seq[String]]("errors").toSet
    assert(!j3errs.contains("result_enum"), "unwrapped [\"PASSED\"] must pass result_enum")
    assert(j3errs === Set("image_ext"))
  }

  test("CSV fixture: corrupt over-length line and missing-_id row dropped, rest coerced") {
    val df = AccessLog.readCsvWithErrorBudget(spark, CsvFixture.ensure())
    assert(df.count() === CsvFixture.Rows)
    val r0 = df.orderBy("elasticsearch_id").head()
    assert(r0.getAs[String]("elasticsearch_id") === "csv0000")
    assert(r0.getAs[Boolean]("access_log_flag") === true)
    assert(r0.getAs[Int]("event_id") === 1)
  }

  test("ES read with caller-supplied fields: one scan, same result as inference") {
    val path = EsFixture.ensure()
    val fields = Seq("_id", "_index", "accessLog", "eventId", "gksType",
      "result", "port", "ip", "nationalityId", "timestamp", "transactionTime",
      "passageDuration", "stadiumId", "transactionId", "isAccreditation",
      "serialNumber")
    val inferred = AccessLog.readEsJson(spark, path)
      .orderBy("elasticsearch_id").drop("created_at")
    val explicit = AccessLog.readEsJson(spark, path, fields = fields)
      .orderBy("elasticsearch_id").drop("created_at")
    assert(explicit.collect().toSeq === inferred.collect().toSeq,
      "explicit ES-mapping fields must reproduce the inferred read exactly")
    // a bounded inference ratio still reads every fixture key (they all
    // appear in the first documents)
    val sampled = AccessLog.readEsJson(spark, path, inferSamplingRatio = 0.2)
      .orderBy("elasticsearch_id").drop("created_at")
    assert(sampled.collect().toSeq === inferred.collect().toSeq)
  }

  test("ES array unwrap parity: first element, empty -> null, numbers, non-array kept") {
    val f = Files.createTempFile("accesslog_unwrap_", ".ndjson")
    Files.writeString(f, Seq(
      """{"_id":"u1","result":["DENIED","ERROR"],"eventId":[7],"port":[443],"gksType":[]}""",
      """{"_id":"u2","result":"[not-an-array","eventId":["8"],"isAccreditation":["false"]}"""
    ).mkString("\n"))
    val rows = AccessLog.readEsJson(spark, f.toString)
      .orderBy("elasticsearch_id").collect()
    val u1 = rows(0)
    assert(u1.getAs[String]("result") === "DENIED", "multi-element array takes First()")
    assert(u1.getAs[Int]("event_id") === 7, "array-wrapped JSON number unwraps + coerces")
    assert(u1.getAs[Int]("port") === 443)
    assert(u1.getAs[Any]("gks_type") === null, "empty array -> null (default(T))")
    val u2 = rows(1)
    assert(u2.getAs[String]("result") === "[not-an-array",
      "a [-prefixed plain string that is not valid JSON stays as-is")
    assert(u2.getAs[Int]("event_id") === 8)
    assert(u2.getAs[Boolean]("is_accreditation") === false)
  }

  test("ES unwrap is a uniform TEXT rule: a string whose content is valid array text unwraps") {
    // documented divergence from the reference (which keeps the string
    // verbatim): after the all-string read the two shapes are
    // indistinguishable; the oracle implements the identical rule
    val f = Files.createTempFile("accesslog_strarr_", ".ndjson")
    Files.writeString(f,
      """{"_id":"t1","serialNumber":"[7,8]","gateName":"[\"G1\",\"G2\"]"}""")
    val r = AccessLog.readEsJson(spark, f.toString).head()
    assert(r.getAs[String]("serial_number") === "7")
    assert(r.getAs[String]("gate_name") === "G1")
  }

  test("IP validation parity: real IPv4 AND IPv6, colon-garbage rejected") {
    def errsFor(ip: String): Set[String] = AccessLog.validate(parse(
      row("ip" -> ip))).head().getAs[scala.collection.Seq[String]]("errors").toSet
    // accepted (IPAddress.TryParse-equivalent forms)
    for (ok <- Seq("10.0.0.1", "255.255.255.255", "2001:db8::1", "::1",
        "fe80::1%eth0", "::ffff:192.168.1.1", "2001:db8::1%eth0.1",
        "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        "1:2:3:4:5:6:1.2.3.4", "1:2:3:4:5::1.2.3.4", "1:2::3:1.2.3.4",
        "::2:1.2.3.4"))
      assert(!errsFor(ok).contains("ip_format"), s"'$ok' must be a valid IP")
    // rejected — colon-containing garbage must NOT pass anymore
    for (bad <- Seq("abc:def:gg::zz", "12345::1", ":::", "1:2:3:4:5:6:7:8:9",
        "999.999.999.999", "not an ip", "fe80:%eth0",
        "1:2:3:4::5:6:7:1.2.3.4"))
      assert(errsFor(bad).contains("ip_format"), s"'$bad' must be rejected")
  }

  test("nationality ID parity: non-11-digit IDs pass on the 5..50 envelope") {
    def errsFor(id: String): Set[String] = AccessLog.validate(parse(
      row("nationalityId" -> id))).head()
      .getAs[scala.collection.Seq[String]]("errors").toSet
    // 9-char foreign ID: valid in the reference (length 5..50 fallback)
    assert(!errsFor("AB1234567").contains("nationality_id_checksum"))
    assert(!errsFor("PASS-12345-XYZ").contains("nationality_id_checksum"))
    // envelope violations
    assert(errsFor("abcd").contains("nationality_id_checksum")) // len 4
    assert(errsFor("x" * 51).contains("nationality_id_checksum"))
    // 11 digits still demand the checksum
    assert(errsFor("12345678901").contains("nationality_id_checksum"))
  }

  test("Turkish checksum uses C# signed %: negative first check digit always rejects") {
    // oddSum=1, evenSum=26 -> C#: (7-26)%10 = -9 (never equals d10);
    // pmod would yield 1 and wrongly accept this ID (d10=1, d11 consistent)
    val id = "19090800018"
    val errs = AccessLog.validate(parse(row("nationalityId" -> id))).head()
      .getAs[scala.collection.Seq[String]]("errors").toSet
    assert(errs.contains("nationality_id_checksum"),
      "negative-remainder ID must be rejected like the reference")
  }

  test("port validated on the raw string (BeValidPort): non-numeric rejects") {
    def errsFor(p: String): Set[String] = AccessLog.validate(parse(
      row("port" -> p))).head().getAs[scala.collection.Seq[String]]("errors").toSet
    assert(errsFor("abc").contains("port_range"), "non-numeric port must violate")
    assert(errsFor("12345678901").contains("port_range"), "int overflow = TryParse failure")
    assert(errsFor("0").contains("port_range"))
    assert(!errsFor("65535").contains("port_range"))
    assert(!errsFor("00000000080").contains("port_range"),
      "long leading-zero numerics parse like int.TryParse (port 80)")
    assert(!errsFor("").contains("port_range"), "null port passes (optional field)")
  }

  test("transaction_time future bound mirrors timestamp_future") {
    val errs = AccessLog.validate(parse(
      row("transactionTime" -> "2099-01-01T00:00:00"))).head()
      .getAs[scala.collection.Seq[String]]("errors").toSet
    assert(errs.contains("transaction_time_future"))
    assert(!errs.contains("timestamp_future"))
  }

  test("soft warnings: long passage, time drift, unusual port, nulls") {
    val w = AccessLog.validate(parse(row(
      "passageDuration" -> "301", "port" -> "80",
      "transactionTime" -> "2024-05-01T12:00:00", // 2h after timestamp
      "eventName" -> ""))).head()
    val warns = w.getAs[scala.collection.Seq[String]]("warnings").toSet
    assert(warns === Set("long_passage", "unusual_port", "time_drift_gt_60m",
      "null_event_name"))
    assert(w.getAs[Boolean]("is_valid"), "warnings never invalidate")
  }

  test("batch stats: counts, ratios, top messages") {
    val stats = AccessLog.batchStats(AccessLog.validate(parse(
      row("_id" -> "a"),
      row("_id" -> "b", "result" -> "BAD"),
      row("_id" -> "c", "port" -> "80")))).head()
    assert(stats.getAs[Long]("total") === 3)
    assert(stats.getAs[Long]("valid") === 2)
    assert(stats.getAs[Long]("invalid") === 1)
    assert(stats.getAs[Long]("with_warnings") === 1)
    assert(math.abs(stats.getAs[Double]("valid_pct") - 200.0 / 3) < 1e-9)
    val top = stats.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top_messages")
    assert(top.map(_.getString(0)).contains("result_enum"))
  }

  test("dedup by elasticsearch_id keeps the newest row") {
    val df = parse(
      row("_id" -> "dup", "eventId" -> "1", "timestamp" -> "2024-05-01T10:00:00"),
      row("_id" -> "dup", "eventId" -> "2", "timestamp" -> "2024-05-02T10:00:00"),
      row("_id" -> "solo", "eventId" -> "3"))
    val out = AccessLog.dedupLatest(df, col("timestamp")).orderBy("elasticsearch_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Int]("event_id") === 2)
  }

  test("S3 header probe: missing required headers reported / enforced") {
    assert(AccessLog.missingRequiredHeaders(Seq("_id", "accessLog")) ===
      Seq("eventid", "timestamp"))
    assert(AccessLog.missingRequiredHeaders(header.split(",").toSeq) === Seq.empty)
    val f = Files.createTempFile("accesslog_nohdr_", ".csv")
    Files.writeString(f, "_id,foo\nx,1")
    assertThrows[IllegalArgumentException](
      AccessLog.readCsvWithErrorBudget(spark, f.toString))
  }

  test("T6 circuit breaker: aborts past the error budget, passes under it") {
    val good = (1 to 5).map(i => row("_id" -> s"ok$i"))
    val bad = (1 to 4).map(_ => row("_id" -> "null")) // fatal missing-_id rows
    val f = Files.createTempFile("accesslog_errs_", ".csv")
    Files.writeString(f, (header +: (good ++ bad)).mkString("\n"))
    // budget 10 : passes, keeps only valid rows
    assert(AccessLog.readCsvWithErrorBudget(spark, f.toString, maxErrors = 10).count() === 5)
    // budget 3 : aborts (StopOnError semantics)
    val ex = intercept[IllegalStateException](
      AccessLog.readCsvWithErrorBudget(spark, f.toString, maxErrors = 3))
    assert(ex.getMessage.contains("error budget exceeded"))
  }

  test("unknown columns tolerated; required headers checked externally") {
    val f = Files.createTempFile("accesslog_extra_", ".csv")
    Files.writeString(f,
      "_id,accessLog,eventId,timestamp,mysteryColumn\nx,true,5,2024-01-01T00:00:00,whatever")
    val df = AccessLog.readCsv(spark, f.toString)
    assert(df.count() === 1)
    assert(df.head().getAs[Int]("event_id") === 5)
    assert(!df.columns.contains("mysteryColumn"))
  }
}
