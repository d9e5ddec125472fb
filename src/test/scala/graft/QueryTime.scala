package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries at a chosen core count (best of `reps`).
  * `sbt "Test/runMain graft.QueryTime <sfDir> <cores> <reps> name ..."` */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val reps = args(2).toInt
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        s
      }.min
      println(f"QTIME $n%-24s $best%.3f s")
    }
    spark.stop()
  }
}
