package engine.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array in ONE codegen'd pass — bit j is the
  * sign of Σ±1 over the tokens' 60-bit md5-prefix hashes (bit j set in a
  * token's hash contributes +1, else −1).
  *
  * The previous formulation exploded tokens and aggregated 60
  * conditional SUM slots per document — a full (doc_id, token-hash)
  * shuffle plus a 60-column hash aggregate, rebuilt by every consumer
  * of the simhash pair table in a bench sweep. SimHash is a pure
  * per-document function, so it belongs in the scan projection: no
  * explode, no exchange, one digest per token.
  *
  * Bit-exact with the aggregate form and with DuckDB's replay
  * (simhashSqlCtes): the per-token hash is exactly [[TextFunctions
  * .tokenHash60]]'s value, and integer ±1 sums are order-free, so
  * where the work runs cannot change any sign. Null tokens are skipped
  * (explodeNonNull semantics); a null array yields NULL, and so does an
  * array with ZERO contributing tokens — with no votes every bit would
  * tie to 1 and all degenerate docs would share signature 2^60−1,
  * silently pairing at hamming 0 (the aggregate form dropped them; a
  * null signature keeps them out of every band join the same way).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  // null both for a null array and for zero contributing tokens
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var contrib = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        contrib += 1
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val h = TokenWindowHash.prefixOf(md.digest(), 15)
        var j = 0
        while (j < 60) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (contrib == 0) null
    else {
      var sim = 0L
      var j = 0
      while (j < 60) {
        if (counts(j) >= 0) sim |= (1L << j)
        j += 1
      }
      sim
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "shMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val (n, i, j, h, d, counts, sim, contrib) = (ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("h"),
        ctx.freshName("d"), ctx.freshName("counts"), ctx.freshName("sim"),
        ctx.freshName("contrib"))
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[60];
         |int $contrib = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $contrib++;
         |  $md.reset();
         |  $md.update($a.getUTF8String($i).getBytes());
         |  byte[] $d = $md.digest();
         |  long $h = 0L;
         |  for (int $j = 0; $j < 8; $j++) $h = ($h << 8) | ($d[$j] & 0xffL);
         |  $h = $h >>> 4;
         |  for (int $j = 0; $j < 60; $j++)
         |    $counts[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |}
         |if ($contrib == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sim = 0L;
         |  for (int $j = 0; $j < 60; $j++)
         |    if ($counts[$j] >= 0) $sim |= (1L << $j);
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def apply(tok: Column): Column =
    ColumnShim.column(SimHash60(ColumnShim.expression(tok)))
}
