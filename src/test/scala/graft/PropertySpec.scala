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
