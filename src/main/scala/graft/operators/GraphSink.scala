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
    * triple_count, checksum, subj_approx_distinct). The checksum is an
    * order-independent sum of row hashes — verifiable without re-reading in
    * any row order; the distinct-subject metric is HyperLogLog++
    * (`approx_count_distinct`) — the only distinct that is mergeable and
    * constant-memory at the 10^12-triple scale SURVEY §2.4 names. */
  def metrics(withBucket: DataFrame): DataFrame =
    withBucket.groupBy("bucket")
      .agg(count(lit(1)).as("triple_count"),
        // bit_xor: order-independent and immune to ANSI-mode long overflow
        bit_xor(xxhash64(col("subj"), col("pred"), col("obj"))).as("checksum"),
        approx_count_distinct(col("subj")).as("subj_approx_distinct"))

  /** The manifest, read with mergeSchema: the schema gained
    * subj_approx_distinct in r3, and without merging a directory mixing
    * old 4-column and new 5-column footers resolves to whichever footer
    * parquet picks first — consumers must see the union schema so old and
    * new rows coexist (ADVICE r3). All manifest readers go through here. */
  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(manifestPath(dir))

  def committedBuckets(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(manifestPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) readManifest(spark, dir).select("bucket").distinct()
    else spark.emptyDataFrame.withColumn("bucket", lit(0L)).limit(0).select("bucket")
  }

  /** Write only the not-yet-committed buckets; returns #buckets written.
    *
    * No `.cache()` of the output (VERDICT r2 "what's wrong" #2): at 100 TB a
    * whole-output cache is a second copy of the dataset. The data pass is
    * consumed exactly once by the write (with an in-flight `observe()`
    * count); the manifest metrics are then computed from the WRITTEN bucket
    * files — one partition-pruned scan of only the new buckets — so the
    * manifest certifies the bytes on disk, not the pre-write plan, and the
    * observed-vs-manifest cross-check now also catches a torn file. */
  def writeResumable(triples: DataFrame, dir: String, runId: String,
      nBuckets: Int = 16, onlyBuckets: Option[Seq[Long]] = None): Long = {
    val spark = triples.sparkSession
    // NOTE: dynamic partition overwrite routes task output through
    // .spark-staging and promotes partition dirs on the DRIVER — the v2
    // task-side committer does not apply to this write (it does apply to
    // the plain-overwrite stage-table writes, see Pipeline.triplesStaged)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // the committed-bucket set is tiny by construction (≤ nBuckets rows per
    // completed run) — collected once, it drives BOTH the resume anti-filter
    // and the pruned metrics read-back
    val doneList = committedBuckets(spark, dir).collect().map(_.getLong(0)).toSeq
    def notDone(c: org.apache.spark.sql.Column) =
      if (doneList.isEmpty) lit(true) else !c.isin(doneList: _*)
    // Stale-output sweep (ADVICE r3): a crashed prior attempt can leave
    // files in a NOT-yet-committed bucket; dynamic partition overwrite only
    // rewrites buckets present in THIS run's output, so a stale bucket that
    // receives zero rows this run would survive, be counted by the metrics
    // read-back below, and abort every retry (recorded != written) until
    // manual cleanup — a permanent wedge. Uncommitted bucket directories
    // are garbage by the resume contract (no manifest row ⇒ never read),
    // so delete them up front: the post-write on-disk state of every
    // not-done bucket is then exactly this run's output. Committed buckets
    // are never touched, and an `onlyBuckets`-restricted run sweeps ONLY
    // its own bucket range — concurrent writers on disjoint onlyBuckets
    // stay safe (an unrestricted sweep would destroy a sibling's in-flight
    // output). Driver-side FS ops on ≤ nBuckets directories.
    val triplesDir = new org.apache.hadoop.fs.Path(s"$dir/triples")
    val fs = triplesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(triplesDir)) {
      val done = doneList.toSet
      val inScope: Long => Boolean =
        onlyBuckets.map(bs => bs.toSet.contains _).getOrElse((_: Long) => true)
      fs.listStatus(triplesDir).foreach { st =>
        val name = st.getPath.getName
        // unparseable bucket dirs (HIVE_DEFAULT_PARTITION, foreign debris)
        // are skipped, not crashed on — they are outside the resume
        // contract either way (never written by bucketCol, never read back)
        if (name.startsWith("bucket=")) {
          scala.util.Try(name.stripPrefix("bucket=").toLong).foreach { b =>
            if (!done.contains(b) && inScope(b)) fs.delete(st.getPath, true)
          }
        }
      }
    }
    val withBucket = triples.withColumn("bucket", bucketCol(nBuckets))
    val restricted = onlyBuckets match {
      case Some(bs) => withBucket.filter(col("bucket").isin(bs: _*))
      case None     => withBucket
    }
    // in-flight lineage metric (SURVEY §2.11 T2 `observe()`): rows counted
    // DURING the data write, then cross-checked against the manifest
    val obs = org.apache.spark.sql.Observation(s"graft_sink_$runId")
    val todo = restricted.filter(notDone(col("bucket")))
      .observe(obs, count(lit(1)).as("rows_written"))
    todo.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(s"$dir/triples")
    // zero-task writes (nothing left to resume) never evaluate the
    // CollectMetrics node — an absent metric means zero rows
    val written = obs.get.getOrElse("rows_written", 0L).asInstanceOf[Long]
    if (written == 0L) return 0L
    // metrics derived from the committed files via a bucket-pruned scan
    val readBack = readTriples(spark, dir)
      .filter(notDone(col("bucket")))
    val newOnly = onlyBuckets match {
      case Some(bs) => readBack.filter(col("bucket").isin(bs: _*))
      case None     => readBack
    }
    val metricsDf = metrics(newOnly)
    val metricRows = metricsDf.collect() // ≤ nBuckets rows by construction
    // the observed-vs-on-disk cross-check runs BEFORE the manifest append
    // (the commit point): a mismatch — torn file, stale leftovers in a
    // not-yet-committed bucket — must abort WITHOUT durably committing
    // those buckets, or resume would skip them forever
    val recorded = metricRows.map(_.getLong(1)).sum
    require(recorded == written,
      s"on-disk/observed mismatch: disk=$recorded observed=$written")
    spark.createDataFrame(
        spark.sparkContext.parallelize(metricRows.toSeq, 1), metricsDf.schema)
      .withColumn("run_id", lit(runId))
      .write.mode(SaveMode.Append).parquet(manifestPath(dir))
    metricRows.length.toLong
  }

  def readTriples(spark: SparkSession, dir: String): DataFrame =
    // partition-column discovery infers int; normalize to the long the
    // writer/manifest use
    spark.read.parquet(s"$dir/triples")
      .withColumn("bucket", col("bucket").cast("long"))
}
