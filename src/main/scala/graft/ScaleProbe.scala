package graft
import org.apache.spark.sql.functions._
object ScaleProbe {
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
    for (q <- Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
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
        "pipeline_pretrain")) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(q)(spark, out).count()
      println(f"SCALE $q: ${(System.nanoTime()-t0)/1e9}%.2f s ($c rows)")
      engine.ScratchCache.drain(); System.gc()
    }
    spark.stop()
  }
}
