package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval-overlap join (SURVEY.md §2.3 J3 generalized; §4 "band/
  * range-join pruning"). The reference bounds its IoU comparisons with a
  * `bisect` over sorted span starts (`src/algorithms/voting.py:43-57`) —
  * a per-document trick that doesn't distribute. Spark has no native range
  * join either; a raw range-condition self-join explodes to |group|² pairs
  * before filtering.
  *
  * Banding makes it an EQUI-join: every interval lands in each fixed-width
  * band it covers, candidates pair per (key..., band), bare id pairs dedupe
  * before any payload re-attaches (same shuffle hygiene as
  * [[Dedup.bucketPairIds]]), and the exact overlap predicate verifies.
  * Candidate volume scales with true overlap density × (span/bandWidth),
  * never with group size squared. `bandWidth` tunes the tradeoff: ~the
  * median interval length is a good default (≤2 bands per interval).
  */
object RangeJoin {

  /** Pairs of same-key rows whose (startCol, endCol) intervals overlap in
    * the OPEN sense: a.start < b.end AND b.start < a.end. Returns
    * (keyCols..., id_a, id_b) with id_a < id_b, exactly once per pair. */
  def overlapPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
      startCol: String, endCol: String, bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val keys = keyCols.map(col)
    // fan-out before the band explode (single-file inputs otherwise run
    // the whole map side on one task — guide §2/§6) and persist: both
    // self-join sides read the same banded table
    val banded = graft.util.Par.fanOut(df.select(
        keys :+ col(idCol).as("_id") :+ col(startCol).cast("double").as("_s")
          :+ col(endCol).cast("double").as("_e"): _*))
      .withColumn("_band", explode(sequence(
        floor(col("_s") / bandWidth).cast("long"),
        floor(col("_e") / bandWidth).cast("long"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(keys :+ col("_band") :+ col("_id").as("id_a")
      :+ col("_s").as("s_a") :+ col("_e").as("e_a"): _*)
    val b = banded.select(keys :+ col("_band") :+ col("_id").as("id_b")
      :+ col("_s").as("s_b") :+ col("_e").as("e_b"): _*)
    a.join(b, keyCols :+ "_band")
      .filter(col("id_a") < col("id_b") &&
        col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      // emit each pair ONCE, in its canonical band — the band holding
      // max(s_a, s_b), which two overlapping intervals always share —
      // instead of emitting per shared band and paying a distinct()
      // shuffle over the full pair set (guide §2.4: remove the shuffle
      // outright; the old plan moved every candidate pair once more)
      .filter(col("_band") ===
        floor(greatest(col("s_a"), col("s_b")) / bandWidth).cast("long"))
      .select(keys :+ col("id_a") :+ col("id_b"): _*)
  }
}
