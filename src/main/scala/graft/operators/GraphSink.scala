package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed, resumable graph sink (SURVEY.md §2.10 + §2.11 T2; north
  * rule "resumable from checkpoint with per-partition lineage + metrics").
  *
  * The triples table is hash-bucketed by conv_id into `nBuckets` partition
  * directories (parquet `partitionBy("bucket")` — the Iceberg-less
  * equivalent of a snapshot commit per partition; the sandbox has no
  * Iceberg jar, SURVEY §7.4 risk 5). A `manifest` table records one row
  * per committed bucket: (run_id, bucket, triple_count, checksum,
  * committed_at-free — no wall clock, the run_id is the lineage key).
  *
  * Resume = left_anti join of the bucket space against the manifest (J4):
  * already-committed buckets are skipped; re-running after a partial
  * failure is idempotent because each bucket directory is overwritten
  * atomically (dynamic partition overwrite) and the manifest row is
  * written only after the data commit.
  */
object GraphSink {

  def bucketCol(nBuckets: Int) = pmod(xxhash64(col("conv_id")), lit(nBuckets))

  def manifestPath(dir: String) = s"$dir/_manifest"

  /** Per-bucket metrics of an already-bucketed triples DataFrame (bucket,
    * triple_count, checksum). The checksum is an order-independent sum of
    * row hashes — verifiable without re-reading in any row order. */
  def metrics(withBucket: DataFrame): DataFrame =
    withBucket.groupBy("bucket")
      .agg(count(lit(1)).as("triple_count"),
        // bit_xor: order-independent and immune to ANSI-mode long overflow
        bit_xor(xxhash64(col("subj"), col("pred"), col("obj"))).as("checksum"))

  def committedBuckets(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(manifestPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(manifestPath(dir)).select("bucket").distinct()
    else spark.emptyDataFrame.withColumn("bucket", lit(0L)).limit(0).select("bucket")
  }

  /** Write only the not-yet-committed buckets; returns #buckets written.
    * `failAfterBuckets` (tests only) simulates a mid-run crash. */
  def writeResumable(triples: DataFrame, dir: String, runId: String,
      nBuckets: Int = 16, onlyBuckets: Option[Seq[Long]] = None): Long = {
    val spark = triples.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val done = committedBuckets(spark, dir)
    val withBucket = triples.withColumn("bucket", bucketCol(nBuckets))
    val restricted = onlyBuckets match {
      case Some(bs) => withBucket.filter(col("bucket").isin(bs: _*))
      case None     => withBucket
    }
    // in-flight lineage metric (SURVEY §2.11 T2 `observe()`): rows counted
    // DURING the data write, then cross-checked against the manifest — a
    // torn write can't go unnoticed between commit and manifest
    val obs = org.apache.spark.sql.Observation(s"graft_sink_$runId")
    val todo = restricted.join(done, Seq("bucket"), "left_anti")
      .observe(obs, count(lit(1)).as("rows_written"))
      .cache()
    try {
      todo.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(s"$dir/triples")
      // zero-task writes (nothing left to resume) never evaluate the
      // CollectMetrics node — an absent metric means zero rows
      val written = obs.get.getOrElse("rows_written", 0L).asInstanceOf[Long]
      // manifest row written ONLY after the data commit (the commit point)
      metrics(todo).withColumn("run_id", lit(runId))
        .write.mode(SaveMode.Append).parquet(manifestPath(dir))
      val manifestRows = spark.read.parquet(manifestPath(dir))
        .filter(col("run_id") === runId)
      val recorded = manifestRows.agg(coalesce(sum(col("triple_count")), lit(0L)))
        .head().getLong(0)
      require(recorded == written,
        s"manifest/observed mismatch: manifest=$recorded observed=$written")
      manifestRows.count()
    } finally todo.unpersist()
  }

  def readTriples(spark: SparkSession, dir: String): DataFrame =
    // partition-column discovery infers int; normalize to the long the
    // writer/manifest use
    spark.read.parquet(s"$dir/triples")
      .withColumn("bucket", col("bucket").cast("long"))
}
