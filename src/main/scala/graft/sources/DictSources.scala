package graft.sources

import graft.model.GazRow
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-based dictionary/gazetteer ingestion (SURVEY.md §2.1 S2-S4):
  * the reference loads UMLS `MRCONSO.RRF` as 18 unnamed pipe-delimited
  * columns (`src/small_tasks/dhp_fhir_tool1_v1.py:65-69`), filters to
  * English rows of four vocabularies and projects four columns into
  * per-vocabulary files (`src/es_helper/create_filtered_data.py:31,79`),
  * and reads csv exports with header renames (`src/small_tasks/run_csv.py:16-36`).
  *
  * Spark-first restatement: one scan → `filter` → `select` →
  * `partitionBy(SAB)` parquet. The SAB partitioning makes per-vocabulary
  * routing (`src/app.py:683-690`) a partition-pruned scan, and parquet
  * gives the filter/projection pushdown the reference implements by hand.
  */
object DictSources {

  /** MRCONSO.RRF column names (UMLS 2023 layout; the reference assigns the
    * same 18 at `dhp_fhir_tool1_v1.py:66-68`). */
  val MrconsoCols: Seq[String] = Seq(
    "CUI", "LAT", "TS", "LUI", "STT", "SUI", "ISPREF", "AUI", "SAUI",
    "SCUI", "SDUI", "SAB", "TTY", "CODE", "STR", "SRL", "SUPPRESS", "CVF")

  val Vocabularies: Seq[String] = Seq("SNOMEDCT_US", "RXNORM", "LNC", "ICD10CM")

  /** S3: pipe-delimited headerless scan with assigned column names. */
  def readRrf(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("delimiter", "|")
      .csv(path)
      .toDF(MrconsoCols: _*)

  /** S2: header csv scan with column renames (old → new). */
  def readCsvRenamed(spark: SparkSession, path: String,
      renames: Map[String, String]): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** S4 filter+projection: English rows of the four vocabularies, gazetteer
    * columns only. Runs AT THE SCAN when the source is parquet (predicate
    * pushdown + column pruning); on csv it is still a single narrow pass. */
  def filterProject(mrconso: DataFrame): DataFrame =
    mrconso
      .filter(col("LAT") === "ENG" && col("SAB").isin(Vocabularies: _*))
      .select(col("CUI"), col("SAB"), col("TTY"), col("ISPREF"),
        col("CODE"), col("STR"))

  /** S4 writer: vocabulary-partitioned parquet — per-SAB routing becomes
    * partition pruning for every downstream reader. */
  def writePartitioned(filtered: DataFrame, path: String): Unit =
    filtered.write.mode(SaveMode.Overwrite).partitionBy("SAB").parquet(path)

  /** Load a written gazetteer back as the engine's typed rows; `sabs`
    * narrows the scan to the named vocabulary partitions. */
  def loadGazetteer(spark: SparkSession, path: String,
      sabs: Seq[String] = Vocabularies): Dataset[GazRow] = {
    import spark.implicits._
    spark.read.parquet(path)
      .filter(col("SAB").isin(sabs: _*))
      .select(
        col("CUI").as("cui"), col("SAB").as("sab"), col("TTY").as("tty"),
        col("ISPREF").as("ispref"), col("CODE").as("code"), col("STR").as("str"))
      .as[GazRow]
  }

  /** One MRCONSO-shaped line for a gazetteer row (test fixture writer —
    * inverse of [[readRrf]]+[[filterProject]]). */
  def toRrfLine(r: GazRow): String = {
    val f = Array.fill(MrconsoCols.length)("")
    f(0) = r.cui; f(1) = "ENG"; f(6) = r.ispref; f(11) = r.sab
    f(12) = r.tty; f(13) = r.code; f(14) = r.str
    f.mkString("|")
  }
}
