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

  /** Run two INDEPENDENT driver actions as concurrent Spark jobs
    * (guide §2.6: Spark happily runs several jobs at once; actions are
    * only sequential because driver code calls them sequentially). `a`
    * runs on a fresh daemon thread, `b` on the caller's thread — no
    * shared pool, so NESTED calls (e.g. a caller overlapping an index
    * build that itself overlaps its two table writes) can never
    * pool-starve into a deadlock. Both sides always complete; the first
    * failure is rethrown. */
  def concurrently(a: => Unit, b: => Unit): Unit = {
    @volatile var ea: Throwable = null
    val t = new Thread(() => try a catch { case x: Throwable => ea = x },
      "graft-par")
    t.setDaemon(true)
    t.start()
    val eb = try { b; null } catch { case x: Throwable => x }
    t.join()
    if (ea != null) throw ea
    if (eb != null) throw eb
  }

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
