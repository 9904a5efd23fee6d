package graft.accesslog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic AccessLog CSV fixture for the `csv_coercion` oracle
  * row — the reference's PRIMARY source (CSVService.cs:247-331) driver-
  * verified, not just spec-verified: header-driven mapping, RFC-4180
  * quoting (embedded commas + doubled quotes), null literals
  * (""/"null"/"NULL"), the full lenient-coercion battery (bool/int/
  * decimal/multi-format timestamp), an unknown tolerated column, a
  * structurally corrupt over-length line (dropped by PERMISSIVE +
  * corrupt-record on the Spark side, `ignore_errors` in DuckDB), and a
  * row missing the row-fatal `_id`. Pure function of the row index —
  * both engines read the SAME file from a fixed path.
  *
  * Kept OUT of the fixture on purpose (cross-engine parse semantics
  * diverge, and the reference never emits them): embedded newlines in
  * quoted fields (Spark needs multiLine), under-length rows (Spark
  * null-pads, DuckDB errors without null_padding), quoted empty
  * strings (engines disagree on ""-vs-NULL before nullNorm runs).
  */
object CsvFixture {

  val DefaultPath = "/tmp/graft_fixtures/accesslog.csv"

  val Rows = 200

  val Headers: Seq[String] = Seq("_id", "_index", "accessLog", "eventId",
    "gksType", "result", "port", "ip", "nationalityId", "timestamp",
    "transactionTime", "passageDuration", "stadiumId", "transactionId",
    "isAccreditation", "serialNumber", "zzUnknown")

  /** RFC-4180 field quoting: wrap iff the value needs it, doubling
    * embedded quotes. */
  private def q(v: String): String =
    if (v.contains(",") || v.contains("\"")) "\"" + v.replace("\"", "\"\"") + "\""
    else v

  def lines: Seq[String] = {
    val header = Headers.mkString(",")
    val rows = (0 until Rows).map { i =>
      val vals = scala.collection.mutable.LinkedHashMap[String, String]()
      vals("_id") = f"csv$i%04d"
      vals("_index") = "accesslog-fixture"
      vals("accessLog") = (i % 5) match {
        case 0 => "true"
        case 1 => "1"
        case 2 => "False"    // case-insensitive bool
        case 3 => "0"
        case _ => "maybe"    // unparseable -> coalesced false
      }
      vals("eventId") = (i % 5) match {
        case 0 => s"${i + 1}"
        case 1 => s"00${i + 1}"   // leading zeros parse (int.TryParse parity)
        case 2 => "not-a-number"  // lenient null
        case 3 => "null"          // literal null string
        case _ => ""              // empty
      }
      vals("gksType") = (i % 5) match {
        case 0 => "TELPO"
        case 1 => "hikvision"
        case 2 => "JUNK"
        case 3 => "NULL"
        case _ => ""
      }
      vals("result") = (i % 6) match {
        case 0 => "PASSED"
        case 1 => "DENIED"
        case 2 => "  PASSED  "   // trimmed by nullNorm
        case 3 => "null"
        case 4 => "MAYBE"
        case _ => ""
      }
      vals("port") = (i % 6) match {
        case 0 => "6666"
        case 1 => "80"
        case 2 => "00080"        // leading-zero numeric
        case 3 => "abc"
        case 4 => "99999"
        case _ => ""
      }
      vals("ip") = (i % 5) match {
        case 0 => s"10.0.${i % 250}.7"
        case 1 => "2001:db8::1"
        case 2 => "999.1.1.1"
        case 3 => "not an ip"
        case _ => ""
      }
      vals("nationalityId") = (i % 4) match {
        case 0 => "10000000146"
        case 1 => "ABC12"
        case _ => ""
      }
      vals("timestamp") = (i % 5) match {
        case 0 => "2024-05-01T10:00:00"
        case 1 => "2024-05-01 10:30:00"
        case 2 => "1714557600"      // epoch seconds
        case 3 => "1714557600000"   // epoch millis (>1e12)
        case _ => "junk"
      }
      vals("transactionTime") = (i % 3) match {
        case 0 => "2024-05-01T10:00:30"
        case 1 => "1714557630"
        case _ => ""
      }
      vals("passageDuration") = (i % 5) match {
        case 0 => "12.50"
        case 1 => "3.75"
        case 2 => "-5"
        case 3 => "x"
        case _ => ""
      }
      vals("stadiumId") = if (i % 3 == 0) s"${i % 50 + 1}" else ""
      vals("transactionId") = if (i % 2 == 0) s"${i + 100}" else ""
      vals("isAccreditation") = (i % 3) match {
        case 0 => "1"
        case 1 => "false"
        case _ => ""
      }
      vals("serialNumber") = (i % 4) match {
        case 0 => s"SN-$i"
        case 1 => s"SN,$i"       // embedded comma -> quoted field
        case 2 => s"SN\"$i\""    // embedded quotes -> doubled
        case _ => ""
      }
      vals("zzUnknown") = if (i % 9 == 0) "dropped" else ""
      Headers.map(h => q(vals(h))).mkString(",")
    }
    Seq(header) ++ rows ++ Seq(
      // missing _id: parses fine, dropped by the row-fatal rule
      "," + Headers.tail.map(_ => "").mkString(","),
      // corrupt: MORE fields than the header -> PERMISSIVE corrupt-record
      // on the Spark side, ignore_errors skip in DuckDB
      Headers.map(_ => "x").mkString(",") + ",extra1,extra2")
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
