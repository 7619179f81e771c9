package engine.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import engine.llm.DoubleArrayDot
import gps.parse.NmeaChecksum

/** Catalyst optimizer rule: rewrite the idiomatic higher-order-function
  * dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DoubleArrayDot]] expression. HOFs are
  * CodegenFallback — users writing the natural formulation silently pay
  * ~100x on pairwise-similarity hot loops; with this rule they get the
  * JIT'd loop for free. IEEE-safe: + and * are commutative (not
  * associative — but operand order within each step is all that changes),
  * and DoubleArrayDot accumulates in the same left-to-right element
  * order as ArrayAggregate. Null-safe: DoubleArrayDot returns NULL on a
  * length mismatch or any null element — exactly what zip_with's null
  * padding + `acc + null` poisoning produce — so the rewrite preserves
  * semantics on ragged and nullable-element arrays too (ExtensionsSpec
  * pins this). */
object AccelerateDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isVarPair(x: Expression, y: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (x, y) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable,
            zy: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(sx, sy, _), Seq(ma: NamedLambdaVariable,
          mv: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          isVarPair(mx, my, zx, zy) && isVarPair(sx, sy, ma, mv) &&
          fin.exprId == fv.exprId =>
      DoubleArrayDot(a, b)
  }
}

/** Catalyst optimizer rule: bound a compared Levenshtein distance.
  *
  *   levenshtein(a, b) <= k   ⇒   levenshtein(a, b, k) >= 0
  *
  * The unbounded form fills the full O(|a|·|b|) DP matrix; the threshold
  * form runs a (2k+1)-wide banded DP and bails out early, returning -1
  * past k — so `dist <= k` and `bounded dist != -1` are equivalent by
  * construction, and strict `< k` is `<= k-1`. Users write the natural
  * predicate; candidate-verification filters (the dedup hot path) get
  * the O(k·n) DP for free. Null semantics unchanged: both forms are
  * null-in/null-out and a NULL predicate drops the row either way. */
object BoundLevenshtein extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.IntegerType

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 0 => bounded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 0 => bounded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 1 => bounded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 1 => bounded(l, r, k - 1)
  }
}

/** Session extension (SURVEY.md §4.2 extension-point wiring): registers
  * the engine's custom expressions as SQL functions and installs
  * [[AccelerateDotProduct]]. Activate with
  * `spark.sql.extensions=engine.ext.GraftExtensions`; for an already-built
  * session use [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.nmeaChecksumFn)
    e.injectFunction(GraftExtensions.doubleArrayDotFn)
    e.injectOptimizerRule(_ => AccelerateDotProduct)
    e.injectOptimizerRule(_ => BoundLevenshtein)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "4.0.0", "", "built-in")

  val nmeaChecksumFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("nmea_checksum"),
      info("nmea_checksum", "nmea_checksum(payload) - NMEA-0183 XOR checksum"),
      (es: Seq[Expression]) => NmeaChecksum(es.head))

  val doubleArrayDotFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("double_array_dot"),
      info("double_array_dot",
        "double_array_dot(a, b) - strict left-to-right dot product"),
      (es: Seq[Expression]) => DoubleArrayDot(es.head, es(1)))

  /** Runtime registration for sessions built without the extension
    * (e.g. the driver harness builds its own SparkSession). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.FunctionShim.register(spark,
      nmeaChecksumFn._1, nmeaChecksumFn._2, nmeaChecksumFn._3)
    org.apache.spark.sql.graft.FunctionShim.register(spark,
      doubleArrayDotFn._1, doubleArrayDotFn._2, doubleArrayDotFn._3)
    if (!spark.experimental.extraOptimizations.contains(AccelerateDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AccelerateDotProduct
    if (!spark.experimental.extraOptimizations.contains(BoundLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BoundLevenshtein
  }
}
