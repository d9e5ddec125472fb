package graft.operators

import graft.model.Segment
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Turn segmentation (SURVEY.md §2.8 F1): split turn text on blank lines,
  * then re-chunk every paragraph into ≤10-line segments — the exact
  * semantics of the reference's chunking loop
  * (`src/app.py:218-224,305-311`; fixture `src/small_tasks/test_split.py`).
  *
  * Implemented as ONE native Catalyst expression
  * ([[graft.functions.Segments]], r7 — a single linear byte scan emitting
  * zero-copy slices) so the whole thing is a narrow, whole-stage-codegen
  * projection with ZERO shuffle; the per-segment char offset (`seg_start`,
  * in turn coordinates) is the W2 offset-invariant carrier (reference
  * global-offset splice `src/app.py:1496-1523`).
  */
object Segmentation {

  /** Array of (seg_text, seg_start) per turn as a single SQL expression —
    * retained as the EXECUTABLE SPEC: [[graft.functions.Segments]] (the
    * native one-pass kernel that replaced this in the hot path, r7) is
    * differential-tested against it. Spark runs higher-order functions
    * interpreted and this tree re-ran the line split per chunk, which
    * profiled at ~40% of all pipeline executor samples at mult=64. */
  val segmentsExpr: String =
    """flatten(
      |  transform(
      |    aggregate(
      |      split(text, '\n\n'),
      |      struct(0 as off, cast(array() as array<struct<ptext:string,poff:int>>) as ps),
      |      (acc, p) -> struct(
      |        cast(acc.off + length(p) + 2 as int) as off,
      |        array_append(acc.ps, struct(p as ptext, acc.off as poff)) as ps),
      |      acc -> acc.ps),
      |    para -> transform(
      |      sequence(0, cast(ceil(size(split(para.ptext, '\n')) / 10.0) as int) - 1),
      |      i -> struct(
      |        array_join(slice(split(para.ptext, '\n'), i * 10 + 1, 10), '\n') as seg_text,
      |        para.poff + element_at(
      |          aggregate(
      |            split(para.ptext, '\n'),
      |            struct(0 as off, cast(array() as array<int>) as st),
      |            (acc2, l) -> struct(
      |              cast(acc2.off + length(l) + 1 as int) as off,
      |              array_append(acc2.st, acc2.off) as st),
      |            acc2 -> acc2.st),
      |          i * 10 + 1) as seg_start))))""".stripMargin

  /** turns(conv_id, turn_idx, text, ...) -> Dataset[Segment]. Narrow. */
  def segments(turns: DataFrame): Dataset[Segment] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select(col("conv_id"), col("turn_idx"),
        graft.functions.Segments.turnSegments(col("text")).as("segs"))
      .select(col("conv_id"), col("turn_idx"),
        posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .select(col("conv_id"), col("turn_idx"), col("seg_idx"),
        col("seg.seg_start").as("seg_start"), col("seg.seg_text").as("seg_text"))
      .as[Segment]
  }

  /** Independent driver-side reference implementation (used by tests as the
    * oracle; mirrors the Python loop literally). */
  def segmentTextOracle(text: String): Vector[(Int, String)] = {
    val out = Vector.newBuilder[(Int, String)]
    var off = 0
    for (para <- splitKeepAll(text, "\n\n")) {
      val lines = splitKeepAll(para, "\n")
      val lineStarts = lines.scanLeft(0)((a, l) => a + l.length + 1)
      var i = 0
      while (i < lines.length) {
        out += ((off + lineStarts(i), lines.slice(i, i + 10).mkString("\n")))
        i += 10
      }
      off += para.length + 2
    }
    out.result()
  }

  /** Python-style split: keeps trailing empty strings. */
  private def splitKeepAll(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      out += s.substring(from, idx)
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.result()
  }
}
