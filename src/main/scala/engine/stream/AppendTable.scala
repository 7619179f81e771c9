package engine.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A crash-safe APPEND-ONLY parquet table for foreachBatch sinks: each
  * commit writes a fresh segment directory (`seg-<id>/`) and then
  * atomically rewrites the `MANIFEST` file (tmp + POSIX rename) to
  * include it. Readers list segments from the manifest ONLY, so a dying
  * writer can never expose torn parquet files — the window that plain
  * `mode("append").parquet(dir)` leaves open (a half-written part-file
  * in the directory IS the table to the next reader). This is the
  * append-side sibling of [[VersionedTable]]'s replace-and-swap: commits
  * stay O(batch) — no rewrite of prior segments — which is the posture
  * an ever-growing signature archive needs. The same shape at cluster
  * scale is a transactional table format's manifest/commit-log doing
  * precisely this under the hood.
  *
  * Crash analysis, single writer (a foreachBatch sink is):
  *  - die mid-segment-write: the segment is not in the manifest —
  *    invisible; the retried batch id overwrites the same segment dir.
  *  - die between segment write and manifest rename: same — invisible,
  *    idempotent re-commit (the manifest add is a set-insert).
  *  - die mid-rename: POSIX rename is atomic — readers see the old or
  *    the new manifest, never a partial one.
  *  - die AFTER the manifest rename but before the engine checkpoints
  *    the batch: the replayed batch finds its segment already
  *    manifest-listed and must NOT rewrite it — `mode("overwrite")`
  *    deletes-then-writes, so a second death mid-rewrite would leave
  *    the manifest pointing at a torn segment. Batch content per id is
  *    deterministic (same source offsets), so the replay no-ops.
  */
object AppendTable {

  private def manifest(root: java.io.File): java.io.File =
    new java.io.File(root, "MANIFEST")

  private def segments(root: java.io.File): Seq[String] = {
    val m = manifest(root)
    if (m.isFile)
      java.nio.file.Files.readAllLines(m.toPath)
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    else Seq.empty
  }

  /** All committed rows (manifest-listed segments only); empty DataFrame
    * of `schema` when nothing has committed. */
  def read(spark: SparkSession, root: java.io.File,
      schema: StructType): DataFrame = {
    val segs = segments(root)
    if (segs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema)
    else
      spark.read.schema(schema)
        .parquet(segs.map(s => new java.io.File(root, s).getPath): _*)
  }

  /** Commit `df` as segment `id`. Idempotent per id: an uncommitted
    * retry overwrites its own (invisible) segment; a retry whose
    * segment is already manifest-listed no-ops entirely — rewriting a
    * committed segment would reopen the torn-file window the manifest
    * exists to close. */
  def append(df: DataFrame, root: java.io.File, id: Long): Unit = {
    root.mkdirs()
    val seg = s"seg-$id"
    if (segments(root).contains(seg)) return
    df.write.mode("overwrite").parquet(new java.io.File(root, seg).getPath)
    val cur = segments(root)
    if (!cur.contains(seg)) {
      val tmp = new java.io.File(root, s"MANIFEST.tmp.$id")
      java.nio.file.Files.writeString(tmp.toPath,
        (cur :+ seg).mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp.toPath, manifest(root).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Remove the table entirely (fresh-run reset). */
  def destroy(root: java.io.File): Unit = deleteRecursively(root)

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
