package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.analyze.{CodeTokenizeExpr, CodeTokenizePosExpr, CodeTokenizeTfExpr, ShinglesExpr}

/** SQL surface for the engine's native expressions, via the standard
  * SparkSessionExtensions hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT graft_tokenize(text)   -- array<string> analyzer tokens
  *   SELECT graft_token_tf(text)   -- struct(doclen, pairs:array<struct<term,tf>>)
  *   SELECT graft_token_positions(text) -- adds positions per term
  *   SELECT graft_shingles(graft_tokenize(text))  -- word 3-grams
  *   SELECT graft_cosine(a, b)     -- cosine over two array<double>
  *   SELECT graft_phrase_match(lists, slop) -- ordered-proximity test
  * }}}
  *
  * [[GraftFunctions.register]] installs the same functions on an
  * already-running session (no extension config needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftFunctions {
  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokenize" -> (exprs => CodeTokenizeExpr(exprs.head)),
    "graft_token_tf" -> (exprs => CodeTokenizeTfExpr(exprs.head)),
    "graft_token_positions" -> (exprs => CodeTokenizePosExpr(exprs.head)),
    "graft_shingles" -> (exprs => ShinglesExpr(exprs.head, 3)),
    "graft_cosine" -> (exprs => graft.ops.CosineSimExpr(exprs.head, exprs(1))),
    "graft_phrase_match" -> (exprs =>
      graft.query.OrderedSpanMatchExpr(exprs.head, exprs(1))))

  /** Session-local registration (temp functions). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
