package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the flagship pipeline at a core count and corpus multiple.
  * `sbt "Test/runMain graft.KgTime <cores> <mult> <reps> [parts] [sfDir]"` */
object KgTime {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val mult = args(1).toInt
    val reps = args(2).toInt
    val parts = if (args.length > 3) args(3).toInt else cores
    val sfDir = if (args.length > 4) args(4) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      // default to the cluster-scale shuffle writer (see Bench.session);
      // -Dspark.shuffle.* sys props still override for A/B runs
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.props.getOrElse("spark.shuffle.sort.bypassMergeThreshold", "1"))
      .config("spark.shuffle.file.buffer",
        sys.props.getOrElse("spark.shuffle.file.buffer", "256k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=$wall%7.2f " +
          f"run=$run%8.2f cpu=$cpu%8.2f  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val base = SparkEntry.cfgOf(sfDir)
    val cfg = base.copy(nConvs = base.nConvs * mult)
    val staged = sys.env.contains("KGTIME_STAGED") // time the stage-table shape
    (1 to reps).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      val n =
        if (staged) {
          val dir = java.nio.file.Files.createTempDirectory("kgtime_stage")
          val c = Pipeline.triplesStaged(spark, cfg, dir.toString).count()
          org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
          c
        } else Pipeline.triples(spark, cfg).count()
      println(f"KGTIME cores=$cores mult=$mult staged=$staged rep=$r n=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f heap=${Runtime.getRuntime.maxMemory / (1 << 20)}MB")
      Thread.sleep(500)
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
