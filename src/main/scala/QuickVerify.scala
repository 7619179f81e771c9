import org.apache.spark.sql.SparkSession
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      engine.ScratchCache.drain()
      val sql = graft.SparkEntry.oracleSql.get(n).getOrElse("")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.sql"), sql)
      println(s"QV dumped $n")
    }
    spark.stop()
  }
}
