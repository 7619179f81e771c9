package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe — not part of the shipped surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def tokens(c: org.apache.spark.sql.Column) = split(c, " ")
    def tokenHash60(t: org.apache.spark.sql.Column) =
      conv(substring(md5(t), 1, 15), 16, 10).cast("long")
    val tok = tokens(col("text"))
    val bigrams = when(size(tok) >= 2,
      transform(sequence(lit(1), size(tok) - 1), i =>
        concat_ws("_", element_at(tok, i), element_at(tok, i + 1))))
      .otherwise(array().cast("array<string>"))
    def lap[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"SCRATCH $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tcol = col("t")
    val bigrams2 = when(size(tcol) >= 2,
      transform(sequence(lit(1), size(tcol) - 1), i =>
        concat_ws("_", element_at(tcol, i), element_at(tcol, i + 1))))
      .otherwise(array().cast("array<string>"))
    // zip_with form: no element_at indexing at all
    val bigrams3 = when(size(tcol) >= 2,
      zip_with(slice(tcol, lit(1), size(tcol) - 1),
        slice(tcol, lit(2), size(tcol) - 1),
        (a, b) => concat_ws("_", a, b)))
      .otherwise(array().cast("array<string>"))
    // warm everything twice
    for (i <- 1 to 2) {
      lap(s"w$i explodeOnly") {
        docs.select(col("doc_id"), explode(bigrams).as("b")).count()
      }
      lap(s"w$i explodePreTok") {
        docs.select(col("doc_id"), tok.as("t"))
          .select(col("doc_id"), explode(bigrams2).as("b")).count()
      }
      lap(s"w$i explodeZip") {
        docs.select(col("doc_id"), tok.as("t"))
          .select(col("doc_id"), explode(bigrams3).as("b")).count()
      }
      lap(s"w$i explodeHash") {
        docs.select(col("doc_id"), explode(bigrams).as("b"))
          .select(col("doc_id"), pmod(tokenHash60(col("b")), lit(64L)).as("j"))
          .count()
      }
      lap(s"w$i hashGroup") {
        docs.select(col("doc_id"), explode(bigrams).as("b"))
          .select(col("doc_id"), pmod(tokenHash60(col("b")), lit(64L)).as("j"))
          .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("x")).count()
      }
      lap(s"w$i hashGroupPersist") {
        val p = docs.select(col("doc_id"), explode(bigrams).as("b"))
          .select(col("doc_id"), pmod(tokenHash60(col("b")), lit(64L)).as("j"))
          .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("x")).persist()
        p.count(); p.unpersist(true)
      }
      lap(s"w$i newFeats") {
        val p = docs.select(col("doc_id"), tok.as("t"))
          .select(col("doc_id"), explode(bigrams2).as("b"))
          .select(col("doc_id"), pmod(tokenHash60(col("b")), lit(64L)).as("j"))
          .repartition(col("doc_id"))
          .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("x")).persist()
        p.count(); p.unpersist(true)
      }
      lap(s"w$i newFeatsNoRepart") {
        val p = docs.select(col("doc_id"), tok.as("t"))
          .select(col("doc_id"), explode(bigrams2).as("b"))
          .select(col("doc_id"), pmod(tokenHash60(col("b")), lit(64L)).as("j"))
          .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("x")).persist()
        p.count(); p.unpersist(true)
      }
    }
    spark.stop()
  }
}
