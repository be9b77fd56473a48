package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** intersect_count(a, b) ≡ size(array_intersect(a, b)) for string arrays,
  * without materializing the intermediate intersection array. Null if
  * either side is null (the non-legacy size() semantics). Distinct
  * semantics match ArrayIntersect: each common value counted once.
  */
object IntersectOps {
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[Any](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) { set.add(small.getUTF8String(i)); i += 1 }
    var n = 0
    i = 0
    while (i < large.numElements()) {
      val v = large.getUTF8String(i)
      if (set.remove(v)) n += 1 // remove → count each distinct value once
      i += 1
    }
    n
  }
}

case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectOps.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectOps.count($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule): rewrite
  * `size(array_intersect(a, b))` over string arrays into the one-pass
  * [[IntersectCountExpr]]. The guard on legacySizeOfNull keeps the
  * null-semantics contract; the string-array guard keeps equality
  * semantics identical (UTF8String equality). The dedup verification
  * queries hit this pattern twice per candidate pair.
  */
object IntersectCountRule extends Rule[LogicalPlan] {
  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ai: ArrayIntersect, false)
        if isStringArray(ai.left) && isStringArray(ai.right) =>
      IntersectCountExpr(ai.left, ai.right)
  }
}
