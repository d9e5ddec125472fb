package graft

import graft.sources.{DictSources, Gazetteer}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-based dictionary ingestion (SURVEY §2.1 S2-S4): RRF scan →
  * filter/project → SAB-partitioned parquet round-trips the gazetteer, and
  * per-vocabulary reads scan only their partition. */
class DictSourcesSpec extends GraftSuite {
  import spark.implicits._

  private lazy val gaz = Gazetteer.rows(48)

  test("RRF pipe scan + filter/project + partitioned write round-trips; pruning works") {
    val dir = Files.createTempDirectory("dict").toString
    val rrf = s"$dir/MRCONSO.RRF"
    // fixture: our rows + noise the filter must drop (non-ENG, foreign SAB)
    val noise = Seq(
      "C9999999|SPA|||||Y|||||SNOMEDCT_US|PT|999|espalda||",
      "C9999998|ENG|||||Y|||||MSH|PT|998|mesh term||")
    Files.write(java.nio.file.Paths.get(rrf),
      (gaz.map(DictSources.toRrfLine) ++ noise).mkString("\n").getBytes)

    val filtered = DictSources.filterProject(DictSources.readRrf(spark, rrf))
    assert(filtered.count() == gaz.length) // noise dropped

    val out = s"$dir/gazetteer"
    DictSources.writePartitioned(filtered, out)
    val back = DictSources.loadGazetteer(spark, out).collect().toSet
    assert(back == gaz.toSet) // exact round-trip through disk

    // partition pruning: the SAB predicate must land in the scan's
    // PartitionFilters (inputFiles can't show this — it lists the
    // relation's files before planning)
    val snomed = DictSources.loadGazetteer(spark, out, Seq("SNOMEDCT_US"))
    val scan = snomed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("SNOMEDCT_US"))
    assert(snomed.collect().toSet == gaz.filter(_.sab == "SNOMEDCT_US").toSet)
  }

  test("csv scan with header renames (reference run_csv projection)") {
    val dir = Files.createTempDirectory("csv").toString
    val p = s"$dir/in.csv"
    Files.write(java.nio.file.Paths.get(p),
      "sqe,old_name,unused\n1,alpha,x\n2,beta,y\n".getBytes)
    val df = DictSources.readCsvRenamed(spark, p, Map("old_name" -> "text"))
      .select("sqe", "text")
    assert(df.columns.toSeq == Seq("sqe", "text"))
    assert(df.orderBy("sqe").collect().map(_.getString(1)).toSeq == Seq("alpha", "beta"))
  }
}
