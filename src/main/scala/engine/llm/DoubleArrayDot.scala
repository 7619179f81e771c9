package engine.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Strict left-to-right dot product of two ARRAY<DOUBLE> columns as a
  * native Catalyst expression with codegen — the hot inner loop of every
  * pairwise-similarity operator (SURVEY.md §2 B49/B51).
  *
  * The `zip_with`+`aggregate` formulation is semantically identical but
  * higher-order functions are CodegenFallback: ~130 interpreted
  * expression-tree walks per 64-dim pair, which at 2M candidate pairs
  * dominated the whole query (20+ s). This compiles to a tight JIT'd
  * multiply-add loop over the unsafe array data.
  *
  * Accumulation order is exactly element 0..n-1 (same as DuckDB's
  * list_sum over list_transform), so oracle comparisons stay
  * bit-identical. Null propagation mirrors the HOF form exactly:
  * zip_with pads a length mismatch with nulls and `acc + null` poisons
  * the aggregate, so mismatched lengths or any null element yield NULL —
  * which is what makes the [[engine.ext.AccelerateDotProduct]] rewrite
  * semantics-preserving on *every* input, not just dense equal-length
  * vectors.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL on ragged/null-element inputs, even when both inputs are non-null
  override def nullable: Boolean = true

  private val ok = ArrayType(DoubleType, containsNull = false)
  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_array_dot requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

object DoubleArrayDot {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      DoubleArrayDot(ColumnShim.expression(a), ColumnShim.expression(b)))
}
