package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-document MinHash signature over an array&lt;string&gt; shingle column
  * in ONE eval: each shingle is hashed once (FNV-1a 64), then the
  * `numHashes` permutations are derived by splitmix64 finalizers —
  * cheap long arithmetic instead of `numHashes` independent string
  * hashes, and (being per-row) NO corpus-wide explode + 64-slot
  * aggregation shuffle. MinHash over a multiset equals MinHash over the
  * set (min is duplicate-blind), so the raw shingle array needs no
  * dedup here.
  *
  * Done in a native expression because the arithmetic wraps: Spark 4
  * runs ANSI mode by default, where a Column-level multiply-add hash
  * family would throw on long overflow; JVM longs wrap silently.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = Dedup.fnv1a64(arr.getUTF8String(i).toString)
      var j = 0
      while (j < numHashes) {
        val h = MinHashSigExpr.mix(base + 0x9E3779B97F4A7C15L * (j + 1))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

object MinHashSigExpr {
  /** splitmix64 finalizer — the permutation family's mixer. */
  @inline def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def sigCol(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(
      MinHashSigExpr(GraftColumnBridge.toExpression(shingles), numHashes))
  }
}
