package gps.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NMEA-0183 checksum: XOR fold over the payload bytes (the text between
  * '$' and '*') — the one reference behavior that genuinely needs
  * per-byte iteration (class.nmea.parser.php:168 documents the `*hh`
  * suffix; the reference never validates it, SURVEY.md §1.5.8).
  *
  * Implemented as a native Catalyst `UnaryExpression` WITH `doGenCode`
  * (SURVEY.md §4.2 stretch): the byte loop compiles into the
  * whole-stage-codegen'd method body, reading `UTF8String` bytes in
  * place — no per-character `substr` allocations, no interpreted
  * higher-order eval. The previous formulation
  * (`aggregate(transform(sequence...substr...))`) fell back to
  * interpreted eval (HOFs are CodegenFallback) at ~60 expression-tree
  * walks per line; this is a tight JIT'd loop, ~100x faster on the
  * synth→parse hot path.
  */
case class NmeaChecksum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nmea_checksum requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nmea_checksum"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0
    var i = 0
    while (i < n) { acc ^= s.getByte(i); i += 1 }
    acc & 0xff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = $c.numBytes();
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) { $acc ^= $c.getByte($i); }
         |${ev.value} = $acc & 0xff;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NmeaChecksum =
    copy(child = newChild)
}

object NmeaChecksum {
  /** Column wrapper: nmea_checksum(payload) as a first-class Column. */
  def apply(payload: Column): Column =
    ColumnShim.column(NmeaChecksum(ColumnShim.expression(payload)))
}
