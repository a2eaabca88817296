package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-set Jaccard over two SORTED string arrays as a native Catalyst
  * expression: one merge pass over the UTF8String elements, zero
  * intermediate allocation.
  *
  * Replaces size(array_intersect)/size(array_union), whose per-row
  * hash-set allocations made the pair-scoring hot loop GC-bound (the
  * allocation stall serializes 32 scoring threads onto the collector).
  * Inputs MUST be sorted ascending (mention contexts are produced sorted
  * by Mentions.fromPages); duplicate elements are tolerated (counted
  * once, as set semantics demand).
  */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"
  // mis-typed inputs must fail analysis, not silently merge garbage
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedJaccardExpr.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedJaccardExpr.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccardExpr {

  /** Merge pass over two sorted UTF8String arrays → |∩| / |∪|. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    var lastA: UTF8String = null
    var lastB: UTF8String = null
    while (i < na && j < nb) {
      val ea = a.getUTF8String(i)
      val eb = b.getUTF8String(j)
      val c = ea.compareTo(eb)
      if (c == 0) {
        // skip duplicates within each side
        if (lastA == null || ea.compareTo(lastA) != 0) { inter += 1; union += 1 }
        lastA = ea; lastB = eb
        i += 1; j += 1
      } else if (c < 0) {
        if (lastA == null || ea.compareTo(lastA) != 0) union += 1
        lastA = ea; i += 1
      } else {
        if (lastB == null || eb.compareTo(lastB) != 0) union += 1
        lastB = eb; j += 1
      }
    }
    while (i < na) {
      val ea = a.getUTF8String(i)
      if (lastA == null || ea.compareTo(lastA) != 0) union += 1
      lastA = ea; i += 1
    }
    while (j < nb) {
      val eb = b.getUTF8String(j)
      if (lastB == null || eb.compareTo(lastB) != 0) union += 1
      lastB = eb; j += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def sorted_jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      SortedJaccardExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
