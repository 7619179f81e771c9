package engine.stream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import gps.TestSpark

/** Pins [[AppendTable.compact]]'s contract (r13 verdict item 6): the
  * fold changes the store's LAYOUT only — read results are the same row
  * multiset before and after, the segment/file counts actually shrink,
  * and a second compaction of an already-folded store is a no-op. */
class AppendTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact folds segments losslessly and is idempotent") {
    val root = new java.io.File(
      s"/tmp/graft_appendtable_spec_${java.util.UUID.randomUUID}")
    try {
      // 5 per-trigger appends, several files each (repartition(3)) —
      // the small-file accumulation a long-running ingest produces
      val schema = Seq((0L, "x")).toDF("id", "k").schema
      (0 until 5).foreach { i =>
        val df = (0 until 40).map(j => (i * 100L + j, s"k${j % 7}"))
          .toDF("id", "k").repartition(3)
        AppendTable.append(df, root, i.toLong)
      }
      assert(AppendTable.segmentCount(root) == 5)
      val filesBefore = AppendTable.fileCount(root)
      assert(filesBefore >= 15, s"expected >=15 part files, $filesBefore")
      val before = AppendTable.read(spark, root, schema)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      AppendTable.compact(spark, root, schema, Seq("k", "id"), nFiles = 1)
      assert(AppendTable.segmentCount(root) == 1)
      assert(AppendTable.fileCount(root) == 1)
      // superseded segment dirs are swept
      assert(Option(root.listFiles()).toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("seg-")) == 1)
      val after = AppendTable.read(spark, root, schema)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(before == after, "compaction changed read results")
      // single-segment store: compact is a no-op (same manifest)
      val manifestBefore = java.nio.file.Files.readString(
        new java.io.File(root, "MANIFEST").toPath)
      AppendTable.compact(spark, root, schema, Seq("k", "id"))
      assert(java.nio.file.Files.readString(
        new java.io.File(root, "MANIFEST").toPath) == manifestBefore)
      // appends keep working after a fold (fresh trigger id)
      AppendTable.append(Seq((900L, "z")).toDF("id", "k"), root, 9L)
      assert(AppendTable.segmentCount(root) == 2)
      assert(AppendTable.read(spark, root, schema).count() == 201)
    } finally {
      AppendTable.destroy(root)
    }
  }
}
