package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev probe: does persisting the NARROW per-turn agg (not the wide linked
  * rows r2 measured) beat recomputing extraction for the second consumer
  * of `turnAgg` in [[graft.operators.Triples.all]]?
  * `sbt "Test/runMain graft.AggCacheProbe <cores> <mult> <reps>"` */
object AggCacheProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val mult = args(1).toInt
    val reps = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = SparkEntry.cfgOf("/root/testdata/sf0.1")
    val cfg = base.copy(nConvs = base.nConvs * mult)
    (1 to reps).foreach { r =>
      // variant B: persist the narrow agg, fill it, then build all four
      // predicate branches over the cached rows
      var t0 = System.nanoTime()
      val t = Pipeline.turns(spark, cfg).toDF()
      val m = Pipeline.mentions(spark, cfg, t)
      val l = Pipeline.linked(spark, cfg, m)
      val agg = operators.Aggregation.perTurn(l)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val aggRows = agg.count()
      val tFill = (System.nanoTime() - t0) / 1e9
      val nB = operators.Triples
        .all(agg, sources.SynthTranscripts.turnsMeta(spark, cfg.nConvs))
        .count()
      val secB = (System.nanoTime() - t0) / 1e9
      agg.unpersist(blocking = true)
      println(f"AGGCACHE rep=$r persistAgg n=$nB aggRows=$aggRows sec=$secB%.3f (fill=$tFill%.3f)")
      // variant A: the current recompute shape
      t0 = System.nanoTime()
      val nA = Pipeline.triples(spark, cfg).count()
      println(f"AGGCACHE rep=$r recompute  n=$nA sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
