package graft

/** Harness tool: print each named query's shuffle exchanges (partitioning
  * + carried columns) and whether the plan contains a collect_set — the
  * quick feedback loop for the PlanSpec exchange pins, without paying a
  * full test-suite run. Usage: runMain graft.PlanDump <sfDir> <name...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    args.drop(1).foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, args(0))
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          println(s"EXCHANGE ${e.outputPartitioning} -> ${e.output.map(a => a.name + ":" + a.dataType.simpleString).mkString(", ")}")
      }
      println(if (exec.toString.contains("collect_set")) "HAS collect_set" else "no collect_set")
    }
    spark.stop()
  }
}
