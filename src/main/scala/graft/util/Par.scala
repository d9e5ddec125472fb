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

  /** Small daemon pool for overlapping INDEPENDENT write jobs inside one
    * operator (guide §2.6: Spark happily runs several jobs at once; actions
    * are only sequential because driver code calls them sequentially).
    * Two threads: enough to back-fill one job's straggler tail with the
    * other's work, not enough to thrash the scheduler. */
  lazy val ioPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(2,
        (r: Runnable) => {
          val t = new Thread(r, "graft-par-io")
          t.setDaemon(true)
          t
        }))

  /** Run both thunks as concurrent Spark jobs and propagate the first
    * failure (both are awaited either way). */
  def concurrently(a: => Unit, b: => Unit): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = ioPool
    val fa = Future(a)
    val fb = Future(b)
    Await.result(fa, Duration.Inf)
    Await.result(fb, Duration.Inf)
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
