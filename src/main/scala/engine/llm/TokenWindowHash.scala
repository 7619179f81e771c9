package engine.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** md5-prefix hashes of token windows, computed in ONE codegen'd pass
  * over the token array — the text pipeline's candidate-key primitive
  * (shingles, duplicated-span windows, dedup-line chunks) without the
  * interpreted-HOF tax (SURVEY.md §4.2).
  *
  * Slot p holds the first `nibbles` hex digits of
  * `md5(concat_ws(" ", slice(arr, p*stride + 1, width)))` as an unsigned
  * long — BYTE-IDENTICAL to the `transform`+`tokenHash60` formulation
  * and to DuckDB's `('0x' || substr(md5(...), 1, nibbles))::BIGINT`, so
  * every oracle replay is unchanged. The HOF formulation builds each
  * window STRING inside an interpreted lambda (transform is
  * CodegenFallback): measured 3.5 s per rebuild of the 3-shingle frame
  * at sf0.1 vs ~0.3 s for this expression — and the shingle frame is
  * rebuilt by every near-dup query in a bench sweep.
  *
  * Window layout:
  *  - `tail = false` (shingles, spans): stride-`stride` windows of
  *    exactly `width` tokens; an input SHORTER than `width` yields one
  *    whole-input window (the shingles3 short-doc fallback).
  *  - `tail = true` (line chunks): ceil(n/stride) windows; the last may
  *    be shorter than `width` (the lineChunks layout).
  *
  * Null/empty token semantics mirror `concat_ws`: null elements are
  * skipped WITHOUT a separator; empty strings keep their separators.
  */
case class TokenWindowHash(child: Expression, width: Int, stride: Int,
    tail: Boolean, nibbles: Int) extends UnaryExpression {

  require(width >= 1 && stride >= 1 && nibbles >= 1 && nibbles <= 15,
    s"token_window_hash(width=$width, stride=$stride, nibbles=$nibbles)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hash requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hash"

  private def windowCount(n: Int): Int =
    if (tail) math.max(1, (n + stride - 1) / stride)
    else if (n >= width) (n - width) / stride + 1
    else 1

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val count = windowCount(n)
    val out = new Array[Long](count)
    val md = java.security.MessageDigest.getInstance("MD5")
    var p = 0
    while (p < count) {
      val start = p * stride
      val len = if (tail) math.min(width, n - start)
                else math.min(width, n) // n < width => whole-input window
      md.reset()
      var first = true
      var j = start
      while (j < start + len) {
        if (!arr.isNullAt(j)) {
          if (!first) md.update(0x20.toByte)
          first = false
          md.update(arr.getUTF8String(j).getBytes)
        }
        j += 1
      }
      out(p) = TokenWindowHash.prefixOf(md.digest(), nibbles)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "twhMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    val hashFn = ctx.addNewFunction("twhWindowHash",
      s"""private long twhWindowHash(org.apache.spark.sql.catalyst.util.ArrayData arr,
         |    int start, int len) {
         |  $md.reset();
         |  boolean first = true;
         |  for (int j = start; j < start + len; j++) {
         |    if (arr.isNullAt(j)) continue;
         |    if (!first) $md.update((byte) 0x20);
         |    first = false;
         |    $md.update(arr.getUTF8String(j).getBytes());
         |  }
         |  byte[] d = $md.digest();
         |  long v = 0L;
         |  for (int k = 0; k < 8; k++) v = (v << 8) | (d[k] & 0xffL);
         |  return v >>> ${64 - 4 * nibbles};
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val (n, count, p, out, start, len) = (ctx.freshName("n"),
        ctx.freshName("count"), ctx.freshName("p"), ctx.freshName("out"),
        ctx.freshName("start"), ctx.freshName("len"))
      val countExpr =
        if (tail) s"java.lang.Math.max(1, ($n + ${stride - 1}) / $stride)"
        else s"($n >= $width) ? ((($n - $width) / $stride) + 1) : 1"
      val lenExpr =
        if (tail) s"java.lang.Math.min($width, $n - $start)"
        else s"java.lang.Math.min($width, $n)"
      s"""
         |int $n = $a.numElements();
         |int $count = $countExpr;
         |long[] $out = new long[$count];
         |for (int $p = 0; $p < $count; $p++) {
         |  int $start = $p * $stride;
         |  int $len = $lenExpr;
         |  $out[$p] = $hashFn($a, $start, $len);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHash =
    copy(child = newChild)
}

object TokenWindowHash {
  /** First `nibbles` hex digits of a digest as an unsigned long —
    * exactly `conv(substring(md5hex, 1, nibbles), 16, 10)`. */
  private[llm] def prefixOf(d: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> (64 - 4 * nibbles)
  }

  def apply(tok: Column, width: Int, stride: Int, tail: Boolean,
      nibbles: Int): Column =
    ColumnShim.column(TokenWindowHash(
      ColumnShim.expression(tok), width, stride, tail, nibbles))
}
