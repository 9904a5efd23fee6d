package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-rule input table (`BASELINE.json` `input_hint`): an
  * Iceberg-style table of source-code repositories with columns
  * `(repo string, path string, commit string, lang string,
  * content string)`.
  *
  * The sandbox ships no external data, so [[synthesize]] derives the
  * table DETERMINISTICALLY from the round's documents table — every
  * column is pure column arithmetic over `(doc_id, lang, source,
  * text)`, reproducible row-for-row by the DuckDB oracle (no UDFs, no
  * randomness, no driver state).
  *
  * Document identity follows SURVEY §1.4: the reference's
  * `elasticsearch_id TEXT UNIQUE` invariant
  * (/root/reference/Services/PostgreSQLService.cs:114,
  * /root/reference/Services/CSVService.cs:467-471) becomes
  * `doc_key = sha256(repo, path, commit)` — the full 256-bit value IS
  * the identity — plus a compact 60-bit `doc_id` surrogate (the key's
  * leading 15 hex digits) for index internals, because a 256-bit
  * string is a terrible shuffle/join key at 10^12 rows. The surrogate
  * is NOT assumed collision-free: [[withDocIds]] gates on
  * `countDistinct(doc_id) == countDistinct(doc_key)` (one
  * map-side-combined aggregation over the corpus, a build-time
  * integrity scan in the same spirit as the reference's upfront
  * validation battery) and FAILS LOUD on collision rather than
  * silently merging two documents' postings.
  */
object CodeCorpus {

  /** Deterministic `(repo, path, commit, lang, content)` table from a
    * round documents table: repo from the source bucket, path from
    * lang + id, commit a 40-hex digest of the id (git-SHA-shaped),
    * content the text verbatim (so the per-row `sha256(content)`
    * invariant checks the REAL payload, not a synthetic one). */
  def synthesize(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("repo-"), col("source")).as("repo"),
        concat(lit("src/"), col("lang"), lit("/doc_"),
          col("doc_id").cast("string"), lit(".txt")).as("path"),
        substring(sha2(concat(lit("c|"), col("doc_id").cast("string")), 256),
          1, 40).as("commit"),
        col("lang"),
        col("text").as("content"))

  /** `doc_key` (full sha256 identity) for a (repo, path, commit)
    * triple. Newline-delimited — a character none of the three parts
    * can contain — so no crafted pair collides by concatenation
    * ambiguity; DuckDB reproduces it as `concat_ws(chr(10), ...)`. */
  def docKeyCol(repo: Column, path: Column, commit: Column): Column =
    sha2(concat_ws("\n", repo, path, commit), 256)

  /** Compact 60-bit surrogate from the key's leading 15 hex digits —
    * `conv(hex, 16, 10)` on the Spark side, `('0x' || hex)::BIGINT`
    * on the DuckDB side (parity spec-pinned). 60 bits keeps the value
    * positive in a signed long on both engines. */
  def docIdCol(docKey: Column): Column =
    conv(substring(docKey, 1, 15), 16, 10).cast("long")

  /** Adds (doc_key, doc_id) and, when `failOnCollision` (default),
    * runs the corpus-wide surrogate-collision gate. At 10^12 docs a
    * 60-bit surrogate WILL eventually collide (birthday bound ~2^30
    * rows); the gate turns that from silent postings corruption into
    * an explicit build failure whose fix is re-keying — never disable
    * it on a production build. */
  def withDocIds(code: DataFrame, failOnCollision: Boolean = true): DataFrame = {
    val out = code
      .withColumn("doc_key", docKeyCol(col("repo"), col("path"), col("commit")))
      .withColumn("doc_id", docIdCol(col("doc_key")))
    if (failOnCollision) {
      // ONE aggregation, three invariants: (a) no null identity parts
      // (nulls would diverge from the oracle's concat semantics AND
      // hide from countDistinct), (b) the triple is UNIQUE per row
      // (the reference's `elasticsearch_id TEXT UNIQUE` — a duplicate
      // key would silently double-count postings), (c) the 60-bit
      // surrogate is injective over the keys.
      val r = out.agg(
        count(lit(1)).as("rows"),
        count(when(col("repo").isNull || col("path").isNull ||
          col("commit").isNull, 1)).as("nulls"),
        countDistinct(col("doc_key")).as("keys"),
        countDistinct(col("doc_id")).as("ids")).head()
      require(r.getLong(1) == 0L,
        s"${r.getLong(1)} rows have a null repo/path/commit — identity undefined")
      require(r.getLong(0) == r.getLong(2),
        s"duplicate (repo, path, commit): ${r.getLong(0)} rows -> ${r.getLong(2)} keys; " +
          "the identity triple must be unique per row")
      require(r.getLong(2) == r.getLong(3),
        s"doc_id surrogate collision: ${r.getLong(2)} keys -> ${r.getLong(3)} ids; " +
          "re-key (widen the surrogate) before indexing")
    }
    out
  }
}
