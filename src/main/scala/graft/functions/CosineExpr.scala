package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two double arrays as a native codegen expression:
  * one fused loop over primitive doubles (dot + both norms), replacing the
  * three separate higher-order `aggregate`/`zip_with` expressions whose
  * per-row lambda evaluation and array allocation dominate the embedding
  * dedup/ANN hot paths. */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // Declared input types make a mis-typed column (e.g. array<float> without
  // the documented cast) an ANALYSIS error — or an implicit cast — instead
  // of getDouble reading misaligned bytes and returning garbage similarities.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CosineExpr.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineExpr.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // include any tail elements in the norms (mismatched dims)
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getDouble(j); nb += y * y; j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_sim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
