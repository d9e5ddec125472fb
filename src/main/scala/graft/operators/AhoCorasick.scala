package graft.operators

import scala.collection.mutable

/** Token-level Aho-Corasick automaton (SURVEY.md §2.9 M1): the Spark-native
  * replacement for the reference's MedCAT dictionary NER
  * (`cat.get_entities`, `src/small_tasks/dhp_fhir_tool1_v1.py:203`).
  * Patterns are normalized token sequences from the broadcast gazetteer;
  * matching runs per partition inside a narrow flatMap — the automaton is
  * built once per executor (see [[AutomatonCache]]) and shared.
  *
  * Design for 100 TB: the automaton is O(gazetteer) memory, built from a
  * broadcast variable; matching is O(tokens) per row with no shuffle. Tokens
  * are interned to Int ids so goto edges are Int->Int hash lookups.
  */
final class AhoCorasick private (
    val tokenIds: java.util.HashMap[String, Integer],
    gotoEdges: Array[mutable.LongMap[Int]],
    fail: Array[Int],
    outputs: Array[List[Int]], // node -> pattern ids ending here
    val patternLen: Array[Int]) {

  @inline private def step(state: Int, tok: Int): Int = {
    var s = state
    while (s != 0 && !gotoEdges(s).contains(tok.toLong)) s = fail(s)
    gotoEdges(s).getOrElse(tok.toLong, 0)
  }

  /** Run over a token-id sequence; emit (startTokenIdx, endTokenIdxExclusive,
    * patternId) for EVERY match (overlaps included — resolution is the
    * caller's longest-match policy). Unknown tokens (-1) reset the state. */
  def findAll(toks: Array[Int]): mutable.ArrayBuffer[(Int, Int, Int)] = {
    val hits = new mutable.ArrayBuffer[(Int, Int, Int)]
    var s = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t < 0) s = 0
      else {
        s = step(s, t)
        var o = s
        while (o != 0) {
          outputs(o).foreach { pid =>
            hits += ((i + 1 - patternLen(pid), i + 1, pid))
          }
          o = fail(o)
        }
      }
      i += 1
    }
    hits
  }

  def tokenId(tok: String): Int = {
    val v = tokenIds.get(tok)
    if (v == null) -1 else v.intValue()
  }
}

object AhoCorasick {

  /** Build from token-sequence patterns. Duplicate patterns allowed; each
    * keeps its own pattern id (payload disambiguation happens upstream). */
  def build(patterns: Array[Array[String]]): AhoCorasick = {
    val tokenIds = new java.util.HashMap[String, Integer]
    def intern(t: String): Int = {
      val v = tokenIds.get(t)
      if (v != null) v.intValue()
      else { val id = tokenIds.size(); tokenIds.put(t, id); id }
    }
    val gotoEdges = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val outputsB = mutable.ArrayBuffer(List.empty[Int])
    // trie insert
    patterns.zipWithIndex.foreach { case (pat, pid) =>
      var node = 0
      pat.foreach { tok =>
        val t = intern(tok).toLong
        node = gotoEdges(node).get(t) match {
          case Some(next) => next
          case None =>
            gotoEdges += mutable.LongMap.empty[Int]
            outputsB += Nil
            val nn = gotoEdges.length - 1
            gotoEdges(node).update(t, nn)
            nn
        }
      }
      outputsB(node) = pid :: outputsB(node)
    }
    // BFS failure links
    val n = gotoEdges.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoEdges(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoEdges(u).foreach { case (tok, v) =>
        var f = fail(u)
        while (f != 0 && !gotoEdges(f).contains(tok)) f = fail(f)
        fail(v) = gotoEdges(f).getOrElse(tok, 0)
        if (fail(v) == v) fail(v) = 0
        queue += v
      }
    }
    new AhoCorasick(tokenIds, gotoEdges.toArray, fail,
      outputsB.toArray.map(_.reverse), patterns.map(_.length))
  }
}
