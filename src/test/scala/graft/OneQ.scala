package graft
import org.apache.spark.sql.SparkSession
object OneQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      SparkEntry.queries(n)(spark, args(0)).coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/oneq/$n")
      println(s"WROTE $n")
    }
    spark.stop()
  }
}
