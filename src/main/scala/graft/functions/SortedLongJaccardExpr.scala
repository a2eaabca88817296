package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard over two SORTED long arrays (token-hash signatures): one merge
  * pass over primitive longs, no allocation, no string compares. The
  * scale rationale: carrying 64-bit token hashes instead of token strings
  * through the pair-scale join cuts shuffle/row bytes ~3x, and this box's
  * (and any node's) memory bandwidth is the binding resource there. */
case class SortedLongJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard"
  // mis-typed inputs must fail analysis, not silently merge garbage
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedLongJaccardExpr.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedLongJaccardExpr.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccardExpr {

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    var last = 0L
    var hasLast = false
    while (i < na && j < nb) {
      val ea = a.getLong(i)
      val eb = b.getLong(j)
      if (ea == eb) {
        if (!hasLast || ea != last) { inter += 1; union += 1 }
        last = ea; hasLast = true
        i += 1; j += 1
      } else if (ea < eb) {
        if (!hasLast || ea != last) union += 1
        last = ea; hasLast = true; i += 1
      } else {
        if (!hasLast || eb != last) union += 1
        last = eb; hasLast = true; j += 1
      }
    }
    while (i < na) {
      val ea = a.getLong(i)
      if (!hasLast || ea != last) union += 1
      last = ea; hasLast = true; i += 1
    }
    while (j < nb) {
      val eb = b.getLong(j)
      if (!hasLast || eb != last) union += 1
      last = eb; hasLast = true; j += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def sorted_long_jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      SortedLongJaccardExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
