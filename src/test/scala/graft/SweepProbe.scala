package graft
import org.apache.spark.sql.SparkSession

/** Dev probe for the r2 kg_triples "regression": time kg_triples fresh
  * (post-sweep) vs riding the block cache kg_link_surface leaves behind —
  * the r1 bench had no inter-query sweep, so its kg_triples number was the
  * second shape. */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    time("kg_triples"); sweep() // warm-up
    (1 to 2).foreach { _ =>
      sweep(); val fresh = time("kg_triples")
      sweep(); time("kg_link_surface")
      val riding = time("kg_triples") // NO sweep: r1 measurement shape
      println(f"PROBE fresh=$fresh%.3f riding=$riding%.3f")
      sweep()
    }
    spark.stop()
  }
}
