package graft.analyze

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TokenizerSpec extends SparkSuite {

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge needed). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("camelCase splits") {
    assert(CodeTokenizer.tokenize("parseCsvLine").toSeq === Seq("parse", "csv", "line"))
    assert(CodeTokenizer.tokenize("parseCSVLine").toSeq === Seq("parse", "csv", "line"))
    assert(CodeTokenizer.tokenize("HTMLParser toBM25x").toSeq === Seq("html", "parser", "bm25x"))
  }

  test("snake_case, paths, punctuation") {
    assert(CodeTokenizer.tokenize("access_log_flag").toSeq === Seq("access", "log", "flag"))
    assert(CodeTokenizer.tokenize("src/main/scala/Foo.scala").toSeq ===
      Seq("src", "main", "scala", "foo", "scala"))
    assert(CodeTokenizer.tokenize("a,b;;c--d").toSeq === Seq())
  }

  test("stopwords, digits, length envelope") {
    assert(CodeTokenizer.tokenize("the quick AND brown").toSeq === Seq("quick", "brown"))
    assert(CodeTokenizer.tokenize("42 1234567 sha256 x9").toSeq === Seq("sha256", "x9"))
    assert(CodeTokenizer.tokenize("x " + "y" * 65 + " ok").toSeq === Seq("ok"))
    assert(CodeTokenizer.tokenize("").toSeq === Seq())
    assert(CodeTokenizer.tokenize(null).toSeq === Seq())
  }

  test("idempotence: tokenizing the joined tokens is a fixpoint") {
    samples(Gen.listOfN(30, Gen.alphaNumStr), 100).foreach { parts =>
      val once = CodeTokenizer.tokenize(parts.mkString(" "))
      val twice = CodeTokenizer.tokenize(once.mkString(" "))
      assert(once.toSeq === twice.toSeq)
    }
  }

  test("ASCII scanner is identical to the regex pipeline (property + edges)") {
    // targeted edges: every boundary-rule interaction the scanner derives
    // from the two ordered regex passes
    val edges = Seq(
      "aAaA", "aAA", "ABc", "ABCdEFGh", "AB1c", "a1A", "aB9c", "ABCDef",
      "A", "AA", "Ab", "aA", "x9z ABCde fgHIj", "snake_caseCamelCASE",
      "ABC", "abcDEFghiJKL", "a0B1c2D3", "__init__", "Foo2Bar",
      "HTMLParser toBM25x", "parseCSVLine", "the THE The tHeX")
    edges.foreach { s =>
      assert(CodeTokenizer.tokenizeAscii(s).toSeq ===
        CodeTokenizer.tokenizeRegex(s).toSeq, s"input: <$s>")
    }
    // property: random ASCII with dense case alternation
    val tokenGen = Gen.listOfN(8, Gen.oneOf(
      Gen.alphaNumChar, Gen.alphaUpperChar, Gen.alphaLowerChar,
      Gen.numChar, Gen.oneOf(' ', '_', '/', '.', ',', '-'))).map(_.mkString)
    val gen = Gen.listOfN(12, tokenGen).map(_.mkString(""))
    (samples(gen, 500) ++ samples(Gen.asciiPrintableStr, 300)).foreach { s =>
      assert(CodeTokenizer.tokenizeAscii(s).toSeq ===
        CodeTokenizer.tokenizeRegex(s).toSeq, s"input: <$s>")
    }
    // dispatcher: unicode routes to the regex path, ASCII to the scanner,
    // and both agree with the canonical semantics either way
    Seq("Ünïcödé čhärs", "中文 词", "KKelvin", "İstanbul", "mixed ASCIIönly")
      .foreach { s =>
        assert(CodeTokenizer.tokenize(s).toSeq ===
          CodeTokenizer.tokenizeRegex(s).toSeq, s"input: <$s>")
      }
  }

  test("Column implementation is identical to pure-Scala implementation") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.oneOf("parseCSVLine", "access_log_flag", "the", "a", "BM25Score",
        "UTF8String", "x", "sha256sum", "..//::", "Ünïcödé čhärs", "中文 词")))
      .map(_.mkString(" "))
    val inputs = samples(gen, 300) :+ "" :+ "  " :+ "theThe aA"
    val df = inputs.toDF("s")
      .select(col("s"), CodeTokenizer.tokensCol(col("s")).as("toks"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      val sparkToks = r.getSeq[String](1)
      assert(sparkToks === CodeTokenizer.tokenize(s).toSeq, s"input: <$s>")
    }
  }

  test("Column implementation matches on the documents corpus") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"), CodeTokenizer.tokensCol(col("text")).as("toks"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) === CodeTokenizer.tokenize(r.getString(0)).toSeq)
    }
  }

  test("fast native Expression is identical to pure-Scala and Column forms") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.oneOf("parseCSVLine", "the", "BM25Score", "x 42 sha256", "Ünïcödé")))
      .map(_.mkString(" "))
    val inputs = samples(gen, 200) :+ "" :+ "theThe aA"
    val df = inputs.toDF("s").select(col("s"),
      CodeTokenizer.tokensColFast(col("s")).as("fast"),
      CodeTokenizer.tokensCol(col("s")).as("slow"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) === CodeTokenizer.tokenize(r.getString(0)).toSeq)
      assert(r.getSeq[String](1) === r.getSeq[String](2))
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"), CodeTokenizer.tokensColFast(col("text")).as("fast"))
    docs.collect().foreach { r =>
      assert(r.getSeq[String](1) === CodeTokenizer.tokenize(r.getString(0)).toSeq)
    }
  }

  test("query analysis: camelCase query equals multi-term query") {
    assert(CodeTokenizer.queryTerms("sparkFastQuery") ===
      CodeTokenizer.queryTerms("spark fast query"))
    assert(CodeTokenizer.queryTerms("the a of") === Seq())
  }

  test("native countInSet equals the higher-order size(filter(isin)) form") {
    import spark.implicits._
    val stops = CodeTokenizer.Stopwords
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf(stops), Gen.oneOf("x", "spark", "of", "the")))
      .map(_.mkString(" "))
    val inputs = samples(gen, 200) :+ "" :+ "the the THE of"
    val df = inputs.toDF("s").select(
      CodeTokenizer.countInSet(split(trim(col("s")), "\\s+"), stops).as("native"),
      size(filter(split(trim(col("s")), "\\s+"),
        t => t.isin(stops: _*))).cast("long").as("hof"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
    }
    // null array propagates null, like size(filter(null)) non-legacy
    val nr = Seq[Option[String]](None).toDF("s").select(
      CodeTokenizer.countInSet(split(col("s"), "\\s+"), stops).as("native"),
      size(filter(split(col("s"), "\\s+"), t => t.isin(stops: _*)))
        .cast("long").as("hof")).head()
    assert(nr.isNullAt(0) === nr.isNullAt(1))
  }
}
