package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two array&lt;double&gt; columns — one eval
  * call per row, no interpreted per-element lambda (the equivalent
  * aggregate/zip_with higher-order form runs its closure once per vector
  * component; at embedding dims x corpus size that is the inner loop of
  * every similarity candidate).
  *
  * Bit-parity contract: accumulation order is ascending index for all
  * three sums, identical to the fold order of the HOF form and the
  * DuckDB oracle's list_sum(list_transform(...)) — equal inputs produce
  * bit-equal doubles (property-tested in SimilaritySpec).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // match the HOF form exactly: norms fold over the FULL vectors even
    // when lengths differ (dot folds over the zip_with min length)
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getDouble(j); nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  /** cos(a, b) as a native expression; inputs must be array&lt;double&gt;. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(CosineSimExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
  }
}
