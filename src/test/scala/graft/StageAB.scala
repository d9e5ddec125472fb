package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: within-ONE-JVM interleaved A/B of the staged pipeline shapes —
  * A = bucketed stage tables (Pipeline.triplesStaged, r6), B = the r5 plain
  * parquet write + read-back-shuffle shape, replicated inline. Alternating
  * reps in one session removes the cross-JVM window drift that makes
  * separate-run comparisons unreadable on this shared box.
  * `sbt "Test/runMain graft.StageAB <cores> <mult> <rounds> [sfDir]"` */
object StageAB {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val mult = args(1).toInt
    val rounds = args(2).toInt
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = SparkEntry.cfgOf(sfDir)
    val cfg = base.copy(nConvs = base.nConvs * mult)

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def runA(): (Long, Double) = timed {
      val dir = java.nio.file.Files.createTempDirectory("ab_bucketed")
      try Pipeline.triplesStaged(spark, cfg, dir.toString).count()
      finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    // B: the r5 shape — plain parquet stage tables, shuffles on read-back
    def runB(): (Long, Double) = timed {
      val dir = java.nio.file.Files.createTempDirectory("ab_plain")
      try {
        val d = dir.toString
        val t = Pipeline.turns(spark, cfg).toDF()
        Pipeline.linked(spark, cfg, Pipeline.mentions(spark, cfg, t))
          .write.mode("overwrite").parquet(s"$d/linked")
        graft.operators.Aggregation.perTurn(spark.read.parquet(s"$d/linked"))
          .write.mode("overwrite").parquet(s"$d/turn_agg")
        graft.operators.Triples.all(spark.read.parquet(s"$d/turn_agg"),
          graft.sources.SynthTranscripts.turnsMeta(spark, cfg.nConvs)).count()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    runA(); runB() // one warm-up each, discarded
    val (as, bs) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val (na, ta) = runA(); as += ta
      val (nb, tb) = runB(); bs += tb
      println(f"STAGEAB round=$r cores=$cores mult=$mult nA=$na nB=$nb A=$ta%.3f B=$tb%.3f")
    }
    val (av, bv) = (as.result(), bs.result())
    println(f"STAGEAB BEST cores=$cores A=${av.min}%.3f B=${bv.min}%.3f ratio=${av.min / bv.min}%.3f")
    spark.stop()
  }
}
