package graft

import graft.model.{GazRow, Mention}
import graft.operators.{MentionExtractor, Segmentation}
import graft.sources.{Gazetteer, SynthTranscripts}

/** Independent naive O(n*m) oracle matcher: no trie, no shared match code —
  * scans every token position against every alias (FIXTURES.md §3 oracle). */
object NaiveMatcher {
  def simpleTokens(text: String): Vector[(String, Int, Int)] = {
    val re = "[A-Za-z0-9]+".r
    re.findAllMatchIn(text).map(m => (m.matched.toLowerCase, m.start, m.end)).toVector
  }
  def stem(t: String): String =
    if (t.length > 3 && t.endsWith("s") && !t.endsWith("ss")) t.dropRight(1) else t

  def rank(tty: String): Int = tty match { case "PT" => 0; case "FN" => 1; case _ => 2 }

  /** variant rules identical to MentionExtractor's spec (not its code). */
  def mentions(convId: String, turnIdx: Int, text: String,
      gaz: Vector[GazRow]): Vector[Mention] = {
    (0 to 2).toVector.flatMap { v =>
      val rows = if (v == 1) gaz.filter(_.ispref == "Y") else gaz
      val doStem = v == 2
      // alias -> best payload by (ttyRank, cui)
      val aliasMap: Map[Vector[String], GazRow] = rows
        .map(r => (simpleTokens(r.str).map(t => if (doStem) stem(t._1) else t._1), r))
        .filter(_._1.nonEmpty)
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).minBy(r => (rank(r.tty), r.cui))).toMap
      val maxLen = if (aliasMap.isEmpty) 0 else aliasMap.keys.map(_.length).max
      // segment exactly like the pipeline, then scan each segment
      Segmentation.segmentTextOracle(text).flatMap { case (segOff, segText) =>
        val toks = simpleTokens(segText)
        val norm = toks.map(t => if (doStem) stem(t._1) else t._1)
        val out = Vector.newBuilder[Mention]
        var i = 0
        while (i < toks.length) {
          var bestLen = 0
          var best: GazRow = null
          var len = math.min(maxLen, toks.length - i)
          while (len >= 1) {
            if (bestLen == 0) {
              aliasMap.get(norm.slice(i, i + len)) match {
                case Some(r) => bestLen = len; best = r
                case None    => ()
              }
            }
            len -= 1
          }
          if (bestLen > 0) {
            val s = toks(i)._2; val e = toks(i + bestLen - 1)._3
            out += Mention(convId, turnIdx, v, segOff + s, segOff + e,
              segText.substring(s, e), best.cui, best.sab, best.code, best.str,
              if (doStem) 0.9 else 0.99)
            i += bestLen
          } else i += 1
        }
        out.result()
      }
    }
  }
}

class MentionSpec extends GraftSuite {

  test("longest match wins: 'acute renal failure' beats 'renal failure'") {
    val gaz = Gazetteer.rows(48)
    val text = "patient with acute renal failure today"
    val got = NaiveMatcher.mentions("c", 0, text, gaz)
      .filter(_.try_index == 0)
    assert(got.map(_.surface) === Vector("acute renal failure"))
  }

  test("Spark extractor == naive oracle on synthetic corpus") {
    import spark.implicits._
    val nBase = 48
    val gaz = Gazetteer.rows(nBase)
    val gazB = spark.sparkContext.broadcast(gaz.toArray)
    val turns = SynthTranscripts.turns(spark, 40, nBase).cache()
    val got = MentionExtractor
      .extract(Segmentation.segments(turns.toDF()), gazB)
      .collect().toSet
    val expected = turns.collect().flatMap { t =>
      NaiveMatcher.mentions(t.conv_id, t.turn_idx, t.text, gaz)
    }.toSet
    assert(got.nonEmpty, "no mentions found at all")
    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(5)} extra=${extra.take(5)}")
  }

  test("mention offsets index the original turn text exactly") {
    import spark.implicits._
    val nBase = 48
    val gazB = spark.sparkContext.broadcast(Gazetteer.rows(nBase).toArray)
    val turns = SynthTranscripts.turns(spark, 25, nBase).cache()
    val textByTurn = turns.collect().map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    val ms = MentionExtractor.extract(Segmentation.segments(turns.toDF()), gazB).collect()
    assert(ms.nonEmpty)
    ms.foreach { m =>
      val full = textByTurn((m.conv_id, m.turn_idx))
      assert(full.substring(m.start, m.end) === m.surface)
    }
  }

  test("stemmed variant (try 2) catches pluralized surfaces the strict one misses") {
    val gaz = Gazetteer.rows(48)
    val text = "noted cardiac infarctions during exam"
    val byTry = NaiveMatcher.mentions("c", 0, text, gaz).groupBy(_.try_index)
    assert(!byTry.contains(0))
    assert(byTry(2).map(_.surface) === Vector("cardiac infarctions"))
  }

  test("gazFingerprint: distinct for every payload-relevant field change") {
    // The automaton cache is keyed by this fingerprint — two gazetteers
    // colliding means a silently-wrong cached automaton (source/code
    // payloads or variant-1 filtering from the OTHER gazetteer).
    val base = Array(GazRow("C1", "SNOMEDCT_US", "PT", "Y", "100", "renal failure"))
    def fp(g: Array[GazRow]) = MentionExtractor.gazFingerprint(g)
    val variants = Seq(
      base.map(_.copy(cui = "C2")),
      base.map(_.copy(sab = "RXNORM")),
      base.map(_.copy(tty = "SY")),
      base.map(_.copy(ispref = "N")),
      base.map(_.copy(code = "999")),
      base.map(_.copy(str = "renal disease")),
      // commutative str+tty collision: swapped values must NOT collide
      base.map(_.copy(tty = base(0).str, str = base(0).tty)))
    variants.foreach(v => assert(fp(v) != fp(base), v.toSeq.toString))
    assert(variants.map(fp).distinct.size == variants.size)
  }
}
