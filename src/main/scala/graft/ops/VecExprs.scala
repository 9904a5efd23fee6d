package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two array&lt;double&gt; columns — one eval
  * call per row, no interpreted per-element lambda (the equivalent
  * aggregate/zip_with higher-order form runs its closure once per vector
  * component; at embedding dims x corpus size that is the inner loop of
  * every similarity candidate). Real doGenCode keeps the candidate scan
  * inside whole-stage codegen (the loop itself runs as a primitive
  * method call on the referenced expression object).
  *
  * Bit-parity contract: accumulation order is ascending index for all
  * three sums, identical to the fold order of the HOF form and the
  * DuckDB oracle's list_sum(list_transform(...)) — equal inputs produce
  * bit-equal doubles (property-tested in SimilaritySpec). Length-
  * mismatched inputs evaluate to NULL, again matching the HOF form
  * (zip_with pads the shorter array with nulls, nulling the dot product
  * and hence the whole expression).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null also on length mismatch, independent of child nullability
  override def nullable: Boolean = true

  /** Primitive hot path, shared by eval and generated code; caller
    * guarantees equal lengths. */
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null else cos(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSimExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.cos($a, $b);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two array&lt;double&gt; columns — the cosine's
  * numerator factored out so pairwise scans can precompute each row's
  * squared norm ONCE instead of re-summing both norms per pair
  * (dot(v, v) = the exact na/nb accumulation of [[CosineSimExpr]]:
  * ascending-index adds of x*x, so cosines reassembled as
  * dot / (sqrt(nasq) * sqrt(nbsq)) are bit-equal to the fused form —
  * property-tested in SimilaritySpec). Same codegen discipline. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Primitive hot path; caller guarantees equal lengths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null else dot(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this, classOf[DotProductExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.dot($a, $b);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  /** cos(a, b) as a native expression; inputs must be array&lt;double&gt;. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CosineSimExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
  }

  /** dot(a, b) as a native expression; inputs must be array&lt;double&gt;. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(DotProductExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
  }
}
