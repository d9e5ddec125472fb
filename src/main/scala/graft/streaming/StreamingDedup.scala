package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental dedup: new documents arrive as a stream and each
  * micro-batch is deduplicated against (1) the persisted minhash band-key
  * index of the historical corpus ([[Dedup.buildMinhashIndex]] — a
  * partition-pruned probe, zero corpus re-signature), (2) everything this
  * stream has already ACCEPTED (earlier micro-batches), and (3) itself
  * (within-batch supersede). Survivors land under
  * `outDir/accepted/batch_id=N`.
  *
  * This is the 100 TB ingest loop (reference analogue: the queue's
  * duplicate-upload guard + supersede semantics, `src/app.py:1191-1208,
  * 1232-1285`, restated over a stream): the big immutable corpus is
  * probed through its index; the small accepted-so-far tail is deduped
  * in-flight ([[Dedup.deltaTrueJaccardPairs]]) until an offline
  * compaction folds it into the index ([[Dedup.appendToMinhashIndex]]) —
  * after which the accepted dirs it covered can be retired. The
  * in-flight tail's cost grows with the tail, not the corpus, which is
  * exactly what compaction bounds.
  *
  * Replay safety (Spark redelivers a batchId after a failure): accepted
  * rows are written with dynamic partition overwrite under their own
  * `batch_id` partition, and the prior-accepted read is filtered to
  * `batch_id < batchId` — a replayed batch sees exactly the prior state
  * its first run saw and overwrites exactly its own output (tested,
  * including replay-after-later-batches). */
object StreamingDedup {

  /** One idempotent micro-batch: probe index → dedup vs prior accepted →
    * within-batch supersede → write survivors under batch_id. */
  def commitBatch(indexPath: String, outDir: String, idCol: String,
      textCol: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // vs the indexed corpus + within-batch (smaller id survives)
    val s1 = Dedup.incrementalNewDocs(spark, indexPath, batch, idCol, textCol)
    val survivors = priorAccepted(spark, outDir, batchId, idCol, textCol) match {
      case None => s1
      case Some(prior) =>
        // prior docs are immutable-accepted: ANY verified pair with one
        // kills the new doc, regardless of id order (same rule as the
        // corpus side of incrementalNewDocs)
        val cross = Dedup.deltaTrueJaccardPairs(prior, s1, idCol, textCol)
        val pIds = prior.select(col(idCol).as("pid"))
        val victims = cross.join(pIds, col("id_a") === col("pid"))
            .select(col("id_b").as("victim"))
          .unionByName(cross.join(pIds, col("id_b") === col("pid"))
            .select(col("id_a").as("victim")))
          .distinct()
        s1.join(victims, s1(idCol) === col("victim"), "left_anti")
    }
    survivors.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).partitionBy("batch_id")
      .parquet(s"$outDir/accepted")
  }

  /** The stream's own accepted output from STRICTLY EARLIER batches —
    * the filter is what makes a replayed batchId deterministic even after
    * later batches have committed. None before the first commit. */
  private def priorAccepted(spark: SparkSession, outDir: String,
      batchId: Long, idCol: String, textCol: String): Option[DataFrame] = {
    val dir = new java.io.File(s"$outDir/accepted")
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

  /** Read back everything the stream has accepted so far. */
  def readAccepted(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/accepted")
}
