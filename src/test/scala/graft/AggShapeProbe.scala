package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: countDistinct(try_index) vs a fixed-domain bit_or mask in the
  * per-turn agg — does the distinct rewrite add a pre-shuffle pass worth
  * money at bench scale?
  * `sbt "Test/runMain graft.AggShapeProbe <cores> <mult> <reps>"` */
object AggShapeProbe {
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
    def linked() = Pipeline.linked(spark, cfg,
      Pipeline.mentions(spark, cfg, Pipeline.turns(spark, cfg).toDF()))
    def bitAgg() = linked()
      .groupBy(col("conv_id"), col("turn_idx"), col("source"), col("code"))
      .agg(
        count(lit(1)).as("total_count"),
        expr("cast(bit_count(bit_or(shiftleft(1L, try_index))) as bigint)")
          .as("unique_count"),
        min(struct(col("try_index"), col("start"), col("cui"),
          col("concept_name"), col("surface"))).as("rep"),
        min(col("icd10_code")).as("icd10_code"),
        min(col("icd10_name")).as("icd10_name"))
    (1 to reps).foreach { r =>
      var t0 = System.nanoTime()
      val nA = operators.Aggregation.perTurn(linked()).count()
      val tA = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nB = bitAgg().count()
      val tB = (System.nanoTime() - t0) / 1e9
      println(f"AGGSHAPE rep=$r countDistinct n=$nA sec=$tA%.3f | bitmask n=$nB sec=$tB%.3f")
    }
    println("--- countDistinct plan ---")
    operators.Aggregation.perTurn(linked()).explain("formatted")
    println("--- bitmask plan ---")
    bitAgg().explain("formatted")
    spark.stop()
  }
}
