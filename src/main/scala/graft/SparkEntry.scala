package graft

import graft.operators.{MentionExtractor, Segmentation}
import graft.sources.{Gazetteer, SynthTranscripts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` entries paired with `oracleSql` are DuckDB-checked by the
  * driver on /root/testdata parquet; KG-pipeline entries (prefix `kg_`)
  * have no SQL equivalent and get a rows-only check — their correctness
  * gate is the ScalaTest oracle suite (`sbt -batch test`).
  */
object SparkEntry {

  /** Scale knobs for the synthetic transcripts corpus derived from the
    * sf directory name (sf0.001 -> small smoke, sf0.1 -> bench). */
  def scaleOf(sfDir: String): (Int, Int) = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    val nConvs = math.max(60, (20000 * sf).toInt) // mega conv 0 ≈ nConvs turns
    val nBase = 192
    (nConvs, nBase)
  }

  private def table(s: SparkSession, sfDir: String, name: String): DataFrame =
    s.read.parquet(s"$sfDir/$name.parquet")

  /** Flagship: synthetic transcripts -> segments -> 3-variant NER mentions. */
  def entry(spark: SparkSession): DataFrame = {
    val (nConvs, nBase) = scaleOf("sf0.001")
    val gazB = spark.sparkContext.broadcast(Gazetteer.rows(nBase).toArray)
    val turns = SynthTranscripts.turns(spark, nConvs, nBase)
    MentionExtractor.extract(Segmentation.segments(turns.toDF()), gazB).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A3 two-phase hash agg analogue (SURVEY §2.4) on lineitem
    "q01_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),
    // KG pipeline slice (rows-only check; oracle lives in ScalaTest)
    "kg_mentions" -> ((s, dir) => {
      val (nConvs, nBase) = scaleOf(dir)
      val gazB = s.sparkContext.broadcast(Gazetteer.rows(nBase).toArray)
      val turns = SynthTranscripts.turns(s, nConvs, nBase)
      MentionExtractor.extract(Segmentation.segments(turns.toDF()), gazB)
        .toDF()
        .orderBy("conv_id", "turn_idx", "try_index", "start")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |count(*) AS cnt,
        |count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
