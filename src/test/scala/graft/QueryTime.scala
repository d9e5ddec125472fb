package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries at a chosen core count (best of `reps`);
  * QTIME_STAGES=1 prints the last rep's per-stage wall/run profile.
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
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=$wall%7.2f " +
          f"run=${si.taskMetrics.executorRunTime / 1e3}%8.2f")
      }
    })
    names.foreach { n =>
      val best = (1 to reps).map { r =>
        if (r == reps) stages.clear() // keep only the last rep's stages
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        s
      }.min
      println(f"QTIME $n%-24s $best%.3f s")
      if (sys.env.contains("QTIME_STAGES")) {
        Thread.sleep(300); stages.forEach(s => println(s))
      }
      stages.clear()
    }
    spark.stop()
  }
}
