package graft

import graft.operators.{ConnectedComponents, Segmentation}
import graft.util.Alignment
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5; scalacheck from build.sbt).
  * Pure-function properties run under forAll; the Spark CC check batches
  * many random graphs into ONE job (per-sample Spark jobs would be
  * pathologically slow). Seeded: failures reproduce. */
class PropertySpec extends GraftSuite {

  private def check(name: String, p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n)
        .withInitialSeed(Seed(42L)), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString)
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> lineGen, 2 -> Gen.const(""), 1 -> Gen.const("")))
      .map(_.mkString("\n"))

  test("segmentation oracle tiles the text: every segment matches its offset substring") {
    check("tiling", Prop.forAll(textGen) { text =>
      Segmentation.segmentTextOracle(text).forall { case (off, seg) =>
        off >= 0 && off + seg.length <= text.length &&
          text.substring(off, off + seg.length) == seg
      }
    })
  }

  test("alignment: deletion-only rewrites map every surviving char back exactly") {
    val gen = for {
      a <- Gen.listOfN(40, Gen.oneOf('a', 'b', ' ', '\n')).map(_.mkString)
      keep <- Gen.listOfN(a.length, Gen.prob(0.7))
    } yield (a, a.zip(keep).collect { case (c, true) => c }.mkString)
    check("alignment", Prop.forAll(gen) { case (a, b) =>
      val ops = Alignment.opcodes(a, b)
      (0 until b.length).forall(j => a.charAt(Alignment.mapPosition(ops, j)) == b.charAt(j))
    })
  }

  test("span tiling + read-back invariants hold on 30 random (text, spans) cases (one Spark job)") {
    import graft.model.Mention
    import graft.operators.SpanTable
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random newline-bearing texts with random non-overlapping spans per try
    val cases = (0 until 30).map { i =>
      val text = (0 until 3 + rnd.nextInt(40)).map { _ =>
        if (rnd.nextInt(6) == 0) "\n" else ('a' + rnd.nextInt(26)).toChar.toString
      }.mkString
      val spans = (0 to 2).flatMap { t =>
        var pos = 0
        val out = Vector.newBuilder[(Int, Int, Int)]
        while (pos < text.length - 1 && rnd.nextInt(3) > 0) {
          val s = pos + rnd.nextInt(math.max(1, text.length - pos - 1))
          val e = math.min(text.length, s + 1 + rnd.nextInt(6))
          if (e > s) { out += ((t, s, e)); pos = e } else pos = text.length
        }
        out.result()
      }
      (s"c$i", text, spans)
    }
    val mentions = cases.flatMap { case (cid, text, spans) =>
      spans.map { case (t, s, e) =>
        Mention(cid, 0, t, s, e, text.substring(s, e), "C1", "SRC", "X", "name", 0.9) }
    }.toDS().toDF()
    val turns = cases.map { case (cid, text, _) => (cid, 0, text) }
      .toDF("conv_id", "turn_idx", "text")
    val tiles = SpanTable.tile(mentions, turns).cache()
    // invariant 1: per artifact, chunks tile [0, len) exactly
    val lens = cases.map { case (cid, text, _) => cid -> text.length }.toMap
    tiles.groupBy("conv_id", "try_index")
      .agg(sum(SpanTable.origLen(col("chunk"))).as("s")).collect()
      .foreach(r => assert(r.getLong(2) == lens(r.getString(0)).toLong, r.toString))
    // invariant 2: read-back start == try * (len + 8) + span start, for all
    val got = SpanTable.readBack(tiles)
      .select("conv_id", "try_index", "start_ind", "end_ind")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = cases.flatMap { case (cid, text, spans) =>
      spans.map { case (t, s, e) =>
        (cid, t, (t * (text.length + 8) + s).toLong, (t * (text.length + 8) + e).toLong) }
    }.toSet
    assert(got == want)
    tiles.unpersist()
  }

  test("connected components == driver union-find on 40 random graphs (one Spark job)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val graphs = (0 until 40).map { g =>
      val nNodes = 2 + rnd.nextInt(12)
      val nEdges = rnd.nextInt(16)
      val edges = Seq.fill(nEdges)((rnd.nextInt(nNodes), rnd.nextInt(nNodes)))
      (g, nNodes, edges)
    }
    // namespaced node id: graph*1000 + node — all graphs in one edge table
    val allEdges = graphs.flatMap { case (g, nNodes, edges) =>
      val self = (0 until nNodes).map(n => (g * 1000L + n, g * 1000L + n))
      self ++ edges.map { case (u, v) => (g * 1000L + u, g * 1000L + v) }
    }.toDF("src", "dst")
    val got = ConnectedComponents.run(allEdges)
      .as[(Long, Long)].collect().toMap
    // the star-contraction fallback must reach the SAME fixpoint on the
    // same composite graph (it is the at-scale path for high diameters —
    // Round4Spec covers the auto-switch; this covers answer equality on
    // 40 random topologies in one job)
    val gotStar = ConnectedComponents.runStarContraction(allEdges)
      .as[(Long, Long)].collect().toMap
    assert(gotStar == got)
    graphs.foreach { case (g, nNodes, edges) =>
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      (0 until nNodes).foreach { n =>
        val expectComp = (0 until nNodes)
          .filter(m => find(m) == find(n)).map(m => g * 1000L + m).min
        assert(got(g * 1000L + n) == expectComp, s"graph $g node $n")
      }
    }
  }
}
