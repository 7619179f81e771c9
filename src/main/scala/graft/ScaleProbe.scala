package graft
import org.apache.spark.sql.functions._

/** 10×-corpus scaling probe over the LLM-pipeline operators — the
  * committed artifact (`scaleprobe.json` in the repo root) is the
  * round-over-round regression gate: each run loads the previous
  * committed timings and fails loudly (exit 1) if any operator's
  * runtime grew more than [[ScaleProbe.RegressionFactor]]× — the signal
  * that a plan quietly lost its banding/broadcast/pruning and went
  * super-linear. Timings on this box carry ±1-2 s noise (see bench
  * discipline note, SURVEY §4.2), hence the deliberately loose factor:
  * the gate catches complexity-class regressions, not jitter. */
object ScaleProbe {
  /** Loose on purpose: ~constant-factor noise passes, O(n²) does not. */
  val RegressionFactor = 15.0
  private val ArtifactPath = "/root/repo/scaleprobe.json"

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft_scale10"
    // 10x documents: replicas get distinct ids and a salt token so
    // replicas are near-dups of each other only within plant groups
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val n = 100000L
    val big = (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * n))
        .withColumn("text", concat(col("text"), lit(s" salt$k")))
    }.reduce(_ unionAll _)
    big.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until 10).map(k => emb.withColumn("vec_id", col("vec_id") + lit(k * n)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println("SCALE wrote 10x corpus: " +
      spark.read.parquet(s"$out/documents.parquet").count() + " docs")
    spark.conf.set("spark.graft.dedupEmbedding.mode", "banded")
    val ops = Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_embedding", "dedup_embedding_banded",
      "dedup_clusters", "dedup_containment", "dedup_edit_distance",
      "dedup_incremental", "sim_search_topk",
      "sim_search_ann", "sim_search_ivf", "text_analysis",
      "text_token_stats", "text_fingerprint", "text_unigram_logprob",
      "sample_hash", "dedup_lines", "pii_scrub", "pack_sequences",
      "dedup_spans", "sample_stratified", "tokenize_ids",
      "embedding_quantize", "embedding_pq",
      // r8 additions: url canon/caps, temperature resample, persisted
      // ANN index + ADC probes, cross-run stores, z-order rewrite
      "dedup_url", "sample_temperature", "sim_search_ivf_indexed",
      "sim_search_pq_adc", "decontaminate_incremental",
      "dedup_embedding_incremental", "stream_ann_probe",
      "pipeline_pretrain",
      // r11 additions: linear quality gate, per-stratum data card,
      // cluster-weighted soft dedup
      "quality_classifier", "corpus_report", "sample_cluster_weighted",
      "multimodal_resize", "text_bigram_logprob",
      // r12 addition: the tokenizer encode path
      "tokenize_bpe_apply")
      // BENCH-IDENTICAL run order via the SHARED key (see
      // SparkEntry.benchOrderKey): unordered, dedup_simhash paid the
      // pair-table build in the probe but read dedup_clusters' cache in
      // the bench — a 20× "growth" that was pure accounting.
      .sortBy(SparkEntry.benchOrderKey)
    val prev = readPrev()
    val results = ops.map { q =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(q)(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $q: $sec%.2f s ($c rows)")
      engine.ScratchCache.drain(); System.gc()
      (q, sec, c)
    }
    val json = results.map { case (q, sec, c) =>
      f"""    "$q": {"sec": $sec%.2f, "rows": $c}"""
    }.mkString(
      "{\n  \"sf_base\": \"sf0.1\", \"scale\": 10,\n  \"ops\": {\n",
      ",\n", "\n  }\n}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(ArtifactPath), json)
    println(s"SCALE wrote $ArtifactPath")
    val regressions = results.flatMap { case (q, sec, _) =>
      prev.get(q).filter(p => p > 0 && sec / p > RegressionFactor)
        .map(p => f"$q: ${p}%.2f -> $sec%.2f s (${sec / p}%.1fx)")
    }
    spark.stop()
    if (regressions.nonEmpty) {
      regressions.foreach(r => println(s"SCALE REGRESSION $r"))
      sys.exit(1)
    }
  }

  /** Previous committed per-op seconds, if an artifact exists. Tolerant
    * flat-regex parse — the file is machine-written by this object. */
  private def readPrev(): Map[String, Double] = {
    val f = java.nio.file.Paths.get(ArtifactPath)
    if (!java.nio.file.Files.isRegularFile(f)) return Map.empty
    val txt = java.nio.file.Files.readString(f)
    """"([a-z0-9_]+)": \{"sec": ([0-9.]+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }
}
