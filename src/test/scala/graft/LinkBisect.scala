package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r6 next #4): phase decomposition of the
  * kg_link_surface query — `sbt "Test/runMain graft.LinkBisect <sfDir>"`.
  * The query is (1) mention extraction + eager cache fill, (2) distinct
  * surfaces -> idf clause scoring against the broadcast alias postings,
  * (3) the per-surface top-k window, (4) the broadcast join-back onto the
  * mention stream + final agg. Times each phase best-of-2 at local[32] so
  * the 4.4-4.9s clean-window level (vs r5's 2.07-3.81s range) is
  * attributable to a named phase instead of adjudicated by eyeball. */
object LinkBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = SparkEntry.cfgOf(sfDir)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one full warm-up (JIT + codegen + automaton cache)
    SparkEntry.queries("kg_link_surface")(spark, sfDir).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val reps = (1 to 2).map { _ =>
      val m = Pipeline.mentions(spark, cfg,
        Pipeline.turns(spark, cfg).toDF()).cache()
      val tFill = timed(m.count())
      val gaz = Pipeline.gazetteer(spark, cfg)._1
      val surfaces = m.select(col("surface")).distinct()
      val cand = operators.Linking.clauseScores(
        surfaces.select(col("surface").as("q")), gaz)
        .withColumnRenamed("q", "surface").cache()
      val tScore = timed(cand.count())
      val wTop = Window.partitionBy("surface")
        .orderBy(col("score").desc, length(col("str")).asc,
          col("code").asc, col("sab").asc)
      val tWindow = timed(cand.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 10).count())
      val tFull = timed(
        operators.Linking.linkBySurface(m, gaz)
          .filter(col("selected"))
          .groupBy(col("sab"), col("code")).agg(count(lit(1)).as("n"))
          .orderBy("sab", "code").count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (tFill, tScore, tWindow, tFull)
    }
    def best(sel: ((Double, Double, Double, Double)) => Double): Double =
      reps.map(sel).min
    println(f"""{"fill_sec":${best(_._1)}%.3f,"score_sec":${best(_._2)}%.3f,""" +
      f""""window_sec":${best(_._3)}%.3f,"full_after_fill_sec":${best(_._4)}%.3f,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
