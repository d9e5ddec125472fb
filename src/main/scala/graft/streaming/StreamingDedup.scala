package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental dedup: new documents arrive as a stream and each
  * micro-batch is deduplicated against (1) the persisted minhash band-key
  * index of the historical corpus ([[Dedup.buildMinhashIndex]] — a
  * partition-pruned probe, zero corpus re-signature), (2) every document
  * the stream has already SEEN (earlier micro-batches — accepted or not),
  * and (3) itself (within-batch supersede). Survivors land under
  * `outDir/accepted/batch_id=N`; each batch's full input is journaled
  * under `outDir/seen/batch_id=N`.
  *
  * Deduping against SEEN (not just accepted) is what makes the streamed
  * result equal the one-shot batch rule on every corpus: the batch rule
  * ([[Dedup.incrementalNewDocs]], and its SQL oracle) kills a doc that
  * pairs with ANY smaller-id delta doc, whether or not that doc itself
  * survived — first occurrence wins, a later twin of a dead doc is still
  * a dup. Dedup-vs-accepted-only would let a doc chain back to life
  * across a batch boundary (corpus a ≈ dead b ≈ new c with a ̸≈ c) and
  * silently diverge from the oracle on corpora containing such chains.
  *
  * This is the 100 TB ingest loop (reference analogue: the queue's
  * duplicate-upload guard + supersede semantics, `src/app.py:1191-1208,
  * 1232-1285`, restated over a stream): the big immutable corpus is
  * probed through its index; the small seen-so-far tail is deduped
  * in-flight ([[Dedup.deltaTrueJaccardPairs]]) until an offline fold
  * appends it into the index ([[Dedup.appendToMinhashIndex]], epoch =
  * the batch range folded) — after which the seen/accepted dirs it
  * covered can be retired, and a periodic
  * [[Dedup.compactMinhashIndex]] rewrites the accumulated epochs
  * blue/green into one. The in-flight tail's cost grows with the tail,
  * not the corpus, which is exactly what the fold bounds.
  *
  * Replay safety (Spark redelivers a batchId after a failure): both
  * outputs are written with a write-scoped dynamic partition overwrite
  * under their own `batch_id` partition, and the prior-seen read is
  * filtered to `batch_id < batchId` — a replayed batch sees exactly the
  * prior state its first run saw and overwrites exactly its own output
  * (tested, including replay-after-later-batches). The overwrite mode is
  * a per-write `.option`, never a session-wide conf mutation (a session
  * flipped to dynamic would silently change every later
  * `mode("overwrite").partitionBy` rebuild in the same session into a
  * partial overwrite). */
object StreamingDedup {

  private def writeDynamic(df: DataFrame, path: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** One idempotent micro-batch: probe index → dedup vs prior seen →
    * within-batch supersede → journal the batch, write survivors. Also
    * drops a zero-row `_schema` parquet once, so [[readAccepted]] can
    * return a typed empty frame even when every committed batch was
    * empty (a dynamic overwrite of an empty frame writes no files at
    * all — without the sentinel an all-empty stream had no schema
    * anywhere on disk and readback threw instead of returning empty).
    *
    * The bucket cap of BOTH pair computations is sized from the full
    * corpus∪seen∪batch doc count — the same corpus-sized basis the batch
    * rule ([[Dedup.incrementalNewDocs]] over the concatenated delta)
    * computes from index meta + delta count. Left to their defaults, the
    * index probe would use only index+batch and the seen-tail cross-check
    * only prior+batch; on a corpus large enough that max(1000, n/2)
    * binds differently across those bases, the streamed and batch paths
    * could cap (and silently drop) different buckets and diverge. */
  def commitBatch(indexPath: String, outDir: String, idCol: String,
      textCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val schemaDir = new java.io.File(s"$outDir/_schema")
    if (!schemaDir.exists())
      batch.select(col(idCol), col(textCol))
        .withColumn("batch_id", lit(-1L)).limit(0)
        .write.mode(SaveMode.Overwrite).parquet(schemaDir.toString)
    if (batch.isEmpty) return
    val prior = priorSeen(spark, outDir, batchId, idCol, textCol)
    val cap = Dedup.capForDocs(
      Dedup.indexedDocCount(spark, indexPath)
        + prior.map(_.count()).getOrElse(0L) + batch.count())
    // vs the indexed corpus + within-batch (smaller id survives)
    val s1 = Dedup.incrementalNewDocs(spark, indexPath, batch, idCol,
      textCol, maxBucket = cap)
    val survivors = prior match {
      case None => s1
      case Some(prior) =>
        // ANY verified pair with a previously-seen doc kills the new doc
        // (first occurrence wins — see the object scaladoc for why seen,
        // not accepted, is the set that matches the batch rule)
        val cross = Dedup.deltaTrueJaccardPairs(prior, s1, idCol, textCol,
          maxBucket = cap)
        val pIds = prior.select(col(idCol).as("pid"))
        val victims = cross.join(pIds, col("id_a") === col("pid"))
            .select(col("id_b").as("victim"))
          .unionByName(cross.join(pIds, col("id_b") === col("pid"))
            .select(col("id_a").as("victim")))
          .distinct()
        s1.join(victims, s1(idCol) === col("victim"), "left_anti")
    }
    writeDynamic(batch.select(col(idCol), col(textCol)),
      s"$outDir/seen", batchId)
    writeDynamic(survivors, s"$outDir/accepted", batchId)
  }

  /** Every doc from STRICTLY EARLIER batches — the filter is what makes a
    * replayed batchId deterministic even after later batches have
    * committed. None before the first commit. */
  private def priorSeen(spark: SparkSession, outDir: String,
      batchId: Long, idCol: String, textCol: String): Option[DataFrame] = {
    val dir = new java.io.File(s"$outDir/seen")
    if (!dir.exists()) None
    else {
      val prior = spark.read.parquet(dir.toString)
        .filter(col("batch_id") < batchId)
        .select(col(idCol), col(textCol))
      if (prior.isEmpty) None else Some(prior)
    }
  }

  /** Start the streaming dedup query over a stream of documents. */
  def start(docsStream: DataFrame, indexPath: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(commitBatch(indexPath, outDir, idCol, textCol) _)
      .start()

  /** Read back everything the stream has accepted so far. When every
    * committed batch was fully deduped — or every delivered batch was
    * empty — `accepted/` holds no data files (a dynamic overwrite of an
    * empty frame writes no partitions) and a bare parquet read cannot
    * infer a schema: fall back to an empty frame with the seen journal's
    * (id, text, batch_id) schema, and failing that the zero-row
    * `_schema` sentinel [[commitBatch]] writes on its first invocation
    * (empty batches included). */
  def readAccepted(spark: SparkSession, outDir: String): DataFrame = {
    def hasParquet(d: java.io.File): Boolean =
      d.isDirectory && d.listFiles().exists(f =>
        hasParquet(f) || (f.isFile && f.getName.endsWith(".parquet")))
    val acc = new java.io.File(s"$outDir/accepted")
    val seen = new java.io.File(s"$outDir/seen")
    val sentinel = new java.io.File(s"$outDir/_schema")
    if (hasParquet(acc)) spark.read.parquet(acc.toString)
    else if (hasParquet(seen)) spark.read.parquet(seen.toString).limit(0)
    else {
      require(sentinel.exists(),
        s"$outDir: no committed batches (no accepted/seen data, no _schema)")
      spark.read.parquet(sentinel.toString)
    }
  }
}
