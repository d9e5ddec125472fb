package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge table via iterative DataFrame
  * self-joins (SURVEY.md §2.11 C1/C2; the Spark restatement of the
  * reference's hand-rolled union-find cluster merge,
  * `src/algorithms/voting.py:46-103`).
  *
  * Min-label propagation: every node repeatedly adopts the minimum
  * component id among itself and its neighbours; converges in
  * O(graph diameter) rounds. Scale notes (north rule):
  *   - `localCheckpoint()` every round cuts the exponentially-growing
  *     lineage (SURVEY §7.4 risk 3);
  *   - convergence is detected with a single cheap aggregate — component
  *     ids only ever DECREASE, so sum(comp) is strictly monotone and
  *     stabilizes exactly at the fixpoint (no expensive row-diff join);
  *   - high-degree hubs (mega-alias concepts) are fine under min-label
  *     because the hot side of the join is the EDGE table, which AQE
  *     skew-join splits; for graphs with diameter ≫ 20 switch to
  *     large-star/small-star (Kiveris et al. 2014) — our alias graphs have
  *     tiny diameters (alias cliques bridged by shared CUIs).
  */
object ConnectedComponents {

  /** edges(src: long, dst: long) -> (id: long, comp: long); isolated nodes
    * must be passed as self-loops if they should appear in the output.
    * Non-convergence within `maxIter` rounds (graph diameter > maxIter —
    * e.g. a path-shaped near-dup chain of incremental edits) THROWS rather
    * than silently returning partial labels: wrong canonical ids are worse
    * than a loud failure telling the caller to raise maxIter or switch to
    * large-star/small-star. */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    // LAZY checkpoints throughout the loop: the convergence aggregate that
    // immediately follows doubles as the materialization action, so each
    // round costs ONE job (checkpoint-then-sum was two) while the plan
    // lineage still truncates to a flat LogicalRDD every round.
    var comp = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(false)

    // decimal(38,0) sum: ids are arbitrary 64-bit hashes, ANSI mode would
    // overflow a long sum; the decimal sum stays exact and monotone
    def compSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
        .getDecimal(0)

    var lastSum = compSum(comp)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(comp, sym("src") === comp("id"))
        .groupBy(col("dst").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val next = comp.join(nbrMin, comp("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      val s = compSum(next)
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      comp = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "graph diameter exceeds maxIter; raise it or use a star-contraction variant")
    comp
  }
}
