package graft.accesslog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic ES-scroll NDJSON fixture for the `es_json_coercion`
  * oracle row: every legitimate `_source` shape the reference's
  * ElasticSearchService handles — plain scalars, raw JSON numbers,
  * array-wrapped scalars (single AND multi element: the reference takes
  * the FIRST element, ElasticSearchService.cs:267-278), empty arrays,
  * JSON null, the literal "null" string, missing keys, unknown keys, a
  * structurally corrupt line, and a document missing the row-fatal
  * `_id`. Pure function of the row index — the Spark side and the
  * DuckDB `read_json` oracle read the SAME file from a fixed path.
  */
object EsFixture {

  val DefaultPath = "/tmp/graft_fixtures/es_accesslog.ndjson"

  val Rows = 240

  /** One NDJSON document per row index (a handful of special lines at
    * the end exercise drop semantics). */
  def lines: Seq[String] = {
    val docs = (0 until Rows).map { i =>
      val b = Vector.newBuilder[String]
      def kv(k: String, v: String): Unit = b += s""""$k":$v"""
      def s(v: String) = s""""$v""""
      kv("_id", s(f"es$i%04d"))
      kv("_index", s("accesslog-fixture"))
      i % 4 match {
        case 0 => kv("accessLog", s("true"))
        case 1 => kv("accessLog", s("1"))
        case 2 => kv("accessLog", """["true"]""")
        case _ => kv("accessLog", "0") // raw JSON number -> false
      }
      i % 6 match {
        case 0 => kv("eventId", s"${i + 1}")         // raw number
        case 1 => kv("eventId", s(s"${i + 1}"))      // string
        case 2 => kv("eventId", s"""["${i + 1}"]""") // array-wrapped string
        case 3 => kv("eventId", s"[${i + 1}]")       // array-wrapped number
        case 4 => kv("eventId", s("not-a-number"))   // lenient null
        case _ =>                                    // missing
      }
      i % 5 match {
        case 0 => kv("gksType", s("TELPO"))
        case 1 => kv("gksType", """["hikvision"]""")
        case 2 => kv("gksType", s("JUNK"))
        case 3 => kv("gksType", "[]")                // empty array -> null
        case _ =>
      }
      i % 7 match {
        case 0 => kv("result", s("PASSED"))
        case 1 => kv("result", """["PASSED"]""")     // the verdict's headline shape
        case 2 => kv("result", """["DENIED","ERROR"]""") // first element wins
        case 3 => kv("result", "[]")
        case 4 => kv("result", s("null"))            // literal "null" string -> null
        case 5 => kv("result", s("MAYBE"))           // enum violation (spec-level)
        case _ =>
      }
      i % 6 match {
        case 0 => kv("port", s("6666"))
        case 1 => kv("port", """["80"]""")
        case 2 => kv("port", "8080")                 // raw number
        case 3 => kv("port", "[443]")                // array-wrapped number
        case 4 => kv("port", s("abc"))
        case _ => kv("port", s("99999"))
      }
      i % 5 match {
        case 0 => kv("ip", s(s"10.0.${i % 250}.7"))
        case 1 => kv("ip", """["2001:db8::1"]""")
        case 2 => kv("ip", s("999.1.1.1"))
        case 3 => kv("ip", "[]")
        case _ =>
      }
      i % 4 match {
        case 0 => kv("nationalityId", s("10000000146"))
        case 1 => kv("nationalityId", """["10000000146"]""")
        case 2 => kv("nationalityId", s("ABC12"))
        case _ =>
      }
      i % 5 match {
        case 0 => kv("timestamp", s("2024-05-01T10:00:00"))
        case 1 => kv("timestamp", """["2024-05-01 10:30:00"]""")
        case 2 => kv("timestamp", s("1714557600"))    // epoch seconds
        case 3 => kv("timestamp", s("1714557600000")) // epoch millis (>1e12)
        case _ => kv("timestamp", s("junk"))
      }
      i % 3 match {
        case 0 => kv("transactionTime", s("2024-05-01T10:00:30"))
        case 1 => kv("transactionTime", """["1714557630"]""")
        case _ =>
      }
      i % 4 match {
        case 0 => kv("passageDuration", s("12.50"))
        case 1 => kv("passageDuration", """["7.25"]""")
        case 2 => kv("passageDuration", "3.75")      // raw number
        case _ => kv("passageDuration", s("-5"))
      }
      i % 3 match {
        case 0 => kv("stadiumId", s"${i % 50 + 1}")
        case 1 => kv("stadiumId", """["17"]""")
        case _ =>
      }
      if (i % 2 == 0) kv("transactionId", s"${i + 100}")
      else kv("transactionId", s"[${i + 100}]")
      i % 3 match {
        case 0 => kv("isAccreditation", s("1"))
        case 1 => kv("isAccreditation", """["false"]""")
        case _ =>
      }
      // i%10==7: a STRING whose content is valid JSON-array text — the
      // uniform text rule unwraps it (documented divergence from the
      // reference; engine and oracle agree by construction)
      if (i % 10 == 7) kv("serialNumber", s(s"[$i,8]"))
      else kv("serialNumber", s(s"SN-$i"))
      if (i % 9 == 0) kv("zzUnknown", s("dropped")) // unknown keys tolerated
      b.result().mkString("{", ",", "}")
    }
    docs ++ Seq(
      """{"_index":"accesslog-fixture","result":"PASSED"}""", // no _id: row-fatal
      """{not valid json at all""")                           // corrupt line: dropped
  }

  /** Write the fixture atomically (idempotent — rewrite only when the
    * content differs) and return its path. */
  def ensure(path: String = DefaultPath): String = {
    val p = Paths.get(path)
    val content = lines.mkString("", "\n", "\n")
    val current =
      if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      else ""
    if (current != content) {
      Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    path
  }
}
