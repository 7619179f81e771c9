package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev probe — not part of the shipped surface. Runs every
  * query with a stderr marker line before each so plan-time log4j
  * warnings (WindowExec "No Partition Defined", HintErrorLogger) can be
  * attributed to the query that produced them. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"=== QUERY $name ===")
      System.err.flush()
      try { fn(spark, d).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"=== FAILED $name: ${e.getMessage}")
      }
      engine.ScratchCache.drain()
    }
    spark.stop()
  }
}
