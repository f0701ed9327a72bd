package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two Array[Float] vectors,
  * accumulated left-to-right in double (same fold order as the higher-order
  * `zip_with`/`aggregate` formulation and DuckDB's list_aggregate, so results
  * are bit-identical — the oracle doesn't notice the swap).
  *
  * This is the hot inner loop of every similarity-search operator: at sf0.1
  * the brute-force top-k evaluates 4M pairs × 64 dims. As a codegen'd
  * expression the pair costs 64 fused multiply-adds on primitive arrays;
  * the higher-order-function version allocates an intermediate 64-element
  * array per pair and interprets two lambdas per element — ~5-10× slower.
  * At 100 TB this is the difference between compute-bound and GC-bound.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // fail fast on length mismatch: a silently-truncated dot product would
      // corrupt every downstream cosine with no error signal
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** SQL-function registration for the native vector expressions. (The
  * Column↔Expression bridge, ExpressionUtils, is private[sql] in Spark 4, so
  * the public path to a custom expression is the function registry + expr().) */
object VectorExprs {
  /** Registers graft_dot for the session. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft_dot")(exprs => DotProduct(exprs.head, exprs(1)))
}
