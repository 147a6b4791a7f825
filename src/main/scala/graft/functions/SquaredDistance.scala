package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: |a−b|² of two double arrays via the
  * dot-product expansion a·a − 2·a·b + b·b.
  *
  * Replaces the three `aggregate(zip_with(...))` higher-order-function
  * dots in the PQ encode/ADC hot path (q72/q80): HOF lambdas evaluate
  * INTERPRETED and knock the whole projection out of whole-stage
  * codegen — the round-5 q44 lesson, applied to the one remaining HOF
  * block on a corpus-sized path. One fused loop, full codegen.
  *
  * Exactness contract (the reason this is an expansion, not
  * `(a_i−b_i)²` folds): each of the three sums accumulates strictly
  * left-to-right exactly like DuckDB's `list_dot_product`, and the
  * final combine is evaluated as ((aa − 2·ab) + bb) — the same
  * associativity the SQL `x - 2 * y + z` parses to — so every double
  * is bit-identical to the oracle's. Returns null if either side is
  * null, if the lengths differ, or if any element is null — the same
  * answers the `aggregate(zip_with(...))` HOF it replaced would give,
  * rather than silently truncating or reading a garbage slot (the
  * function is registered session-wide, so SQL callers beyond the
  * non-null fixed-width PQ paths inherit these semantics).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq"
  // null is also produced VALUE-wise (length mismatch, null element),
  // not only when a child is null
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left.dataType, right.dataType).forall {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2sq requires array<double>, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      aa += xi * xi; ab += xi * yi; bb += yi * yi
      i += 1
    }
    (aa - 2.0 * ab) + bb
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val aa = ctx.freshName("aa")
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $aa = 0.0; double $ab = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $aa += $xi * $xi; $ab += $xi * $yi; $bb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ($aa - 2.0 * $ab) + $bb; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Register `l2sq(a, b)` in the session's function registry
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("l2sq",
        exprs => SquaredDistance(exprs(0), exprs(1)), "built-in")
}
