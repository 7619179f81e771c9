package engine.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe — not part of the shipped surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val brute = LlmQueries.queries("sim_search_topk")
      .fn(spark, d).select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((pm, subD, pk) <- Seq((4, 16, 64), (8, 8, 64), (4, 16, 256))) {
      val got = CurateQueries.pqAdcTopKFor(spark, d, pm, subD, pk)
        .select(col("qid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"SCRATCH pq($pm,$subD,$pk): recall=${
        (brute & got).size.toDouble / brute.size}%.2f")
    }
    spark.stop()
  }
}
