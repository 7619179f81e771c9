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

  /** MAINTENANCE: fold every committed segment into one range-clustered
    * segment without changing read results — the small-file remedy for
    * a long-running ingest, whose one-parquet-append-per-trigger layout
    * otherwise accumulates files without bound (r13 verdict item 6;
    * the lakehouse `OPTIMIZE` applied to the store layout). The rows
    * are rewritten range-clustered on `clusterKeys` so per-file min/max
    * stats stay narrow and a later keyed probe (the stores are probed
    * by digest / band key) prunes files.
    *
    * Same commit discipline as [[append]]: write the folded segment
    * (named `seg-c<n>`, outside the batch-id namespace so a later
    * trigger id can never collide with it), atomically swap the
    * MANIFEST to list only it, then sweep the superseded segment dirs.
    * A death mid-write or pre-swap leaves the fold invisible; a death
    * post-swap leaves unreferenced old dirs the next compact sweeps.
    * MUST NOT run concurrently with a writer (single-writer contract:
    * a replayed batch id folded into `seg-c*` is no longer
    * manifest-listed, so a concurrent replay would double-append). */
  def compact(spark: SparkSession, root: java.io.File, schema: StructType,
      clusterKeys: Seq[String], nFiles: Int = 1): Unit = {
    import org.apache.spark.sql.functions.col
    val segs = segments(root)
    if (segs.size <= 1) return
    val gen = segs.filter(_.startsWith("seg-c"))
      .map(_.stripPrefix("seg-c").toLong).maxOption.getOrElse(-1L) + 1
    val folded = s"seg-c$gen"
    read(spark, root, schema)
      .repartitionByRange(nFiles, clusterKeys.map(col): _*)
      .sortWithinPartitions(clusterKeys.map(col): _*)
      .write.mode("overwrite")
      .parquet(new java.io.File(root, folded).getPath)
    val tmp = new java.io.File(root, s"MANIFEST.tmp.c$gen")
    java.nio.file.Files.writeString(tmp.toPath, folded + "\n")
    java.nio.file.Files.move(tmp.toPath, manifest(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(root.listFiles()).foreach(_.filter(f => f.isDirectory &&
        f.getName.startsWith("seg-") && f.getName != folded)
      .foreach(deleteRecursively))
  }

  /** Committed segment count — the maintenance observability hook
    * ([[compact]]'s before/after pin). */
  def segmentCount(root: java.io.File): Int = segments(root).size

  /** Data file count across committed segments (part-files only). */
  def fileCount(root: java.io.File): Int = segments(root).map { sg =>
    Option(new java.io.File(root, sg).listFiles()).toSeq.flatten
      .count(f => f.isFile && f.getName.startsWith("part-"))
  }.sum

  /** Remove the table entirely (fresh-run reset). */
  def destroy(root: java.io.File): Unit = deleteRecursively(root)

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
