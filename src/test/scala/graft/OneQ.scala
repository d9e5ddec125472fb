package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump selected queries to /tmp/oneq/<name> for ad-hoc oracle
  * checks — `sbt "Test/runMain graft.OneQ <sfDir> name ..."`. Mirrors
  * Verify's session config AND its inter-query cache sweep so the dump
  * can't diverge from what the driver's run would produce. */
object OneQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OneQ <sfDir> <query> [query ...]")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      SparkEntry.queries(n)(spark, args(0)).coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/oneq/$n")
      println(s"WROTE $n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
