package graft

import graft.operators.Segmentation
import graft.sources.{Gazetteer, SynthTranscripts}

class SegmentationSpec extends GraftSuite {

  // the ABCDE fixture from the reference's test_split.py:1-59:
  // 3 paragraphs of 19 lines each -> chunks of 10+9 lines per paragraph
  private val para =
    "A\nB\nC\nD\nE\nA\nB\nC\nD\nEA\nB\nC\nD\nE\nA\nB\nC\nD\nE"
  private val abcde = Seq(para, para, para).mkString("\n\n")

  test("oracle segmentation reproduces reference test_split semantics") {
    val segs = Segmentation.segmentTextOracle(abcde)
    assert(segs.length === 6) // 3 paragraphs x (10-line + 9-line chunk)
    assert(segs(0)._2 === "A\nB\nC\nD\nE\nA\nB\nC\nD\nEA")
    assert(segs(1)._2 === "B\nC\nD\nE\nA\nB\nC\nD\nE")
    // offsets: reassembling from offsets must reproduce the text
    segs.foreach { case (off, t) =>
      assert(abcde.substring(off, off + t.length) === t)
    }
  }

  test("Spark segmentation == oracle on synthetic turns, and reassembles text") {
    import spark.implicits._
    val turns = SynthTranscripts.turns(spark, 30, 48).cache()
    val got = Segmentation.segments(turns.toDF())
      .collect()
      .groupBy(s => (s.conv_id, s.turn_idx))
      .view.mapValues(_.sortBy(_.seg_idx).map(s => (s.seg_start, s.seg_text)).toVector)
      .toMap
    val turnRows = turns.collect()
    assert(turnRows.nonEmpty)
    turnRows.foreach { t =>
      val expected = Segmentation.segmentTextOracle(t.text)
      val actual = got((t.conv_id, t.turn_idx))
      assert(actual === expected, s"turn ${t.conv_id}/${t.turn_idx}")
      // per-turn text equality: every segment is a literal substring at its offset
      actual.foreach { case (off, seg) =>
        assert(t.text.substring(off, off + seg.length) === seg)
      }
    }
  }

  test("segmentation survives repartition (stable ordering invariant)") {
    import spark.implicits._
    val turns = SynthTranscripts.turns(spark, 20, 48).toDF()
    val a = Segmentation.segments(turns).collect().toSet
    val b = Segmentation.segments(turns.repartition(13)).collect().toSet
    assert(a === b)
  }

  test("native segment kernel == retired SQL HOF expression on edge cases " +
      "and == oracle (differential spec for the r7 hot-path rewrite)") {
    import org.apache.spark.sql.functions.{col, expr, posexplode}
    import spark.implicits._
    val edges = Seq(
      "",                          // empty text -> one empty segment at 0
      "x",
      "x\n\n",                     // trailing empty paragraph kept
      "\n\nx",                     // leading empty paragraph
      "a\n\n\nb",                  // odd '\n' run: paras ["a", "\nb"]
      "a\n\n\n\nb",                // paras ["a", "", "b"]
      "\n\n\n\n",                  // only separators
      "a\nb\nc",
      (1 to 10).map("L" + _).mkString("\n"),   // exactly one full chunk
      (1 to 11).map("L" + _).mkString("\n"),   // chunk + 1-line tail
      (1 to 25).map("L" + _).mkString("\n"),   // 3 chunks
      "über\nmüde\n\nnaïve £5 → ✓\n日本語のテキスト\nx", // multi-byte UTF-8
      "a\n\nb" * 7,
      abcde)
    val turns = edges.zipWithIndex
      .map { case (t, i) => ("c0", i, t) }.toDF("conv_id", "turn_idx", "text")
    def explode(segs: org.apache.spark.sql.Column) = turns
      .select(col("turn_idx"), posexplode(segs).as(Seq("seg_idx", "seg")))
      .select(col("turn_idx"), col("seg_idx"),
        col("seg.seg_start").as("off"), col("seg.seg_text").as("txt"))
      .as[(Int, Int, Int, String)].collect().sorted.toVector
    val native = explode(graft.functions.Segments.turnSegments(col("text")))
    val sqlHof = explode(expr(Segmentation.segmentsExpr))
    assert(native === sqlHof)
    // and both == the Python-literal oracle (code-point offsets: convert)
    val oracle = edges.zipWithIndex.flatMap { case (t, i) =>
      Segmentation.segmentTextOracle(t).zipWithIndex.map { case ((off, s), j) =>
        (i, j, t.substring(0, off).codePointCount(0, off), s)
      }
    }.sorted.toVector
    assert(native === oracle)
  }

  test("plantable surfaces exist and gazetteer rows are well-formed") {
    val rows = Gazetteer.rows(48)
    assert(rows.map(r => (r.sab, r.code, r.str)).distinct.size === rows.size)
    assert(rows.exists(_.sab == "ICD10CM"))
    assert(Gazetteer.plantableSurfaces(48).contains("acute renal failure"))
  }
}
