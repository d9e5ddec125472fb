package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out of narrow sources (optimization guide §2: make
  * partitioning scale-adaptive rather than a constant; §6: a small input
  * file yields ONE scan split). The bench/verify corpora are single small
  * parquet files, so every per-row kernel projection (minhash/simhash
  * signatures, shingle tables, LSH signatures, IVF assignment) planned
  * directly over the scan serializes on one core of local[32] — measured
  * 4.5 s single-task stages at sf0.1. At cluster scale the inputs arrive
  * in thousands of splits and the fan-out is a no-op by construction.
  */
object Par {

  /** Round-robin repartition `df` to the session's default parallelism IF
    * its current physical partitioning is narrower — otherwise return it
    * unchanged (no shuffle). The shuffle this inserts moves only the
    * narrow pre-kernel rows (id + text / id + vector), never derived
    * signatures, and round-robin repartition is retry-deterministic
    * (sort-before-repartition, SPARK-23207). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the physical RDD but launches no job
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
