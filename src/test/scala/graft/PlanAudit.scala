package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans of selected queries so the
  * shuffle/broadcast/pushdown shape can be audited by eye.
  * `sbt "Test/runMain graft.PlanAudit [sfDir] [name ...]"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q21_offset_splice")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"========== $n ==========")
      n match {
        // the SparkEntry query runs probeAll (the losslessness oracle);
        // this pseudo-name audits the production MULTI-PROBE read instead
        case "sim_lsh_indexed_pruned" =>
          import org.apache.spark.sql.functions.col
          val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          val q = emb.filter(col("vec_id") === 0)
            .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
          val idx = java.nio.file.Files.createTempDirectory("graft_lshidx_audit")
          org.apache.commons.io.FileUtils.forceDeleteOnExit(idx.toFile)
          operators.Similarity.buildLshIndex(emb, "vec_id", "embedding", idx.toString)
          operators.Similarity.lshTopKIndexed(spark, idx.toString, "vec_id",
            "embedding", q, 5).explain("formatted")
        case _ => SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
