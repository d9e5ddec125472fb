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

  test("plantable surfaces exist and gazetteer rows are well-formed") {
    val rows = Gazetteer.rows(48)
    assert(rows.map(r => (r.sab, r.code, r.str)).distinct.size === rows.size)
    assert(rows.exists(_.sab == "ICD10CM"))
    assert(Gazetteer.plantableSurfaces(48).contains("acute renal failure"))
  }
}
