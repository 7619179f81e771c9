package engine.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column library (SURVEY.md §2 B49, B51): cosine
  * similarity and sign-random-projection LSH over `ARRAY<FLOAT>` columns,
  * as pure `Column` compositions (`zip_with`/`aggregate`) — codegen'd,
  * no UDFs.
  *
  * All arithmetic is promoted to DOUBLE *before* accumulation and summed
  * strictly left-to-right, so the DuckDB oracle (list_transform with
  * ::DOUBLE + list_sum) computes the bit-identical IEEE result.
  */
object VectorFunctions {

  /** float[] -> double[] (promote once, then all math is exact-order). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-order dot product — the codegen'd [[DoubleArrayDot]]
    * expression (the zip_with+aggregate form is interpreted and was the
    * bottleneck of every pairwise-similarity query). */
  def dot(a: Column, b: Column): Column = DoubleArrayDot(a, b)

  /** L2 norm (same element order as list_sum of squares). */
  def norm(a: Column): Column = sqrt(DoubleArrayDot(a, a))

  /** Cosine similarity of two double vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 hyperplane coefficient for (plane j, dim d), derived
    * from md5 so executors and tests agree with no shared state. */
  private def coeff(j: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8"))
    if ((digest(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** Sign-random-projection LSH code (nPlanes bits) for a double vector:
    * bit j = [dot(v, h_j) >= 0] with h_j a fixed ±1 hyperplane. Vectors
    * with high cosine agree on most bits; banding the code turns ANN
    * search into an equi-join on band keys — the 100 TB path that replaces
    * the O(n²) cross join.
    *
    * `dim` must equal the vectors' actual length: [[DoubleArrayDot]] is
    * NULL on length mismatch, and a silently-NULL planeDot would fold
    * every vector to code 0 — i.e. every band collides and the candidate
    * join degenerates to a cross product. The guard makes that loud. */
  def srpCode(v: Column, nPlanes: Int, dim: Int): Column = {
    // NULL vector → NULL code (band keys never equi-join ⇒ the row is
    // excluded, matching the exact path where a null cosine fails every
    // threshold); a present-but-wrong-length vector fails loudly
    val guard = when(isnull(v), lit(null).cast("long"))
      .when(size(v) === lit(dim), lit(0L))
      .otherwise(raise_error(
        concat(lit(s"srpCode: hyperplane dim $dim but vector has "),
          size(v).cast("string"), lit(" elements"))))
    (0 until nPlanes).map { j =>
      val planeDot = DoubleArrayDot(v, lit((0 until dim).map(coeff(j, _)).toArray))
      when(planeDot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _) + guard
  }

  /** All bands of an LSH/simhash code as ARRAY<STRUCT<band, bv>> — explode
    * this to get one (band index, band value) row per band. Shift amounts
    * are compile-time constants so the whole thing stays codegen'd. */
  def codeBands(code: Column, nBands: Int, w: Int): Column =
    array((0 until nBands).map { b =>
      struct(
        lit(b).as("band"),
        shiftright(code, b * w).bitwiseAND(lit((1L << w) - 1)).as("bv"))
    }: _*)
}
