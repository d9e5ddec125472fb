package graft.util

import scala.collection.mutable

/** Position re-mapping between an original string and a rewritten variant
  * (SURVEY.md §2.8 F5; reference `src/algorithms/llm_ner.py:185-256`, which
  * uses difflib.SequenceMatcher opcodes to map LLM-rewritten-text offsets
  * back to the source). Our dictionary matcher reports true offsets, so the
  * hot path never needs this — it is kept as a library function for fuzzy
  * sources (normalizers that collapse whitespace, strip markup, etc.).
  *
  * Algorithm: longest-common-subsequence opcodes via O(n·m) DP — strings
  * here are per-segment (≤10 lines), so quadratic cost is bounded; callers
  * aligning whole documents should chunk first (as the reference does).
  */
object Alignment {

  /** (tag, i1, i2, j1, j2): tag ∈ equal | delete | insert, [i1,i2) in `a`,
    * [j1,j2) in `b` — difflib's opcode quintuple (difflib's `replace` is
    * an adjacent delete+insert here; mapPosition treats them identically). */
  final case class Op(tag: String, i1: Int, i2: Int, j1: Int, j2: Int)

  /** LCS opcodes between two strings. */
  def opcodes(a: String, b: String): Vector[Op] = {
    val n = a.length; val m = b.length
    // lcs(i)(j) = LCS length of a[i:], b[j:]
    val lcs = Array.ofDim[Int](n + 1, m + 1)
    var i = n - 1
    while (i >= 0) {
      var j = m - 1
      while (j >= 0) {
        lcs(i)(j) =
          if (a.charAt(i) == b.charAt(j)) lcs(i + 1)(j + 1) + 1
          else math.max(lcs(i + 1)(j), lcs(i)(j + 1))
        j -= 1
      }
      i -= 1
    }
    // standard LCS walk emitting one step per char, then merge runs
    val steps = mutable.ArrayBuffer.empty[String]
    var si = 0; var sj = 0
    while (si < n || sj < m) {
      if (si < n && sj < m && a.charAt(si) == b.charAt(sj)) {
        steps += "equal"; si += 1; sj += 1
      } else if (sj < m && (si == n || lcs(si)(sj + 1) >= lcs(si + 1)(sj))) {
        steps += "insert"; sj += 1
      } else {
        steps += "delete"; si += 1
      }
    }
    val ops = mutable.ArrayBuffer.empty[Op]
    var ci = 0; var cj = 0
    var k = 0
    while (k < steps.length) {
      val tag = steps(k)
      var k2 = k
      while (k2 < steps.length && steps(k2) == tag) k2 += 1
      val len = k2 - k
      val (i2, j2) = tag match {
        case "equal"  => (ci + len, cj + len)
        case "insert" => (ci, cj + len)
        case _        => (ci + len, cj)
      }
      ops += Op(tag, ci, i2, cj, j2)
      ci = i2; cj = j2; k = k2
    }
    ops.toVector
  }

  /** Map a position in `b` (the rewritten text) back to `a` (the original):
    * equal runs map exactly; positions inside inserted regions
    * clamp to the region's start in `a` (the reference's behavior — a span
    * that begins in rewritten-only text anchors at the nearest original
    * offset). Position `b.length` maps to `a.length`. */
  def mapPosition(ops: Vector[Op], pos: Int): Int = {
    ops.foreach { op =>
      if (pos >= op.j1 && pos < op.j2)
        return if (op.tag == "equal") op.i1 + (pos - op.j1) else op.i1
    }
    ops.lastOption.map(_.i2).getOrElse(0)
  }

  /** Convenience: map a [start, end) span of `b` back into `a` coordinates;
    * `end` is mapped exclusively (end−1's image +1) so equal-run spans
    * round-trip exactly. */
  def mapSpan(a: String, b: String, start: Int, end: Int): (Int, Int) = {
    val ops = opcodes(a, b)
    val s = mapPosition(ops, start)
    val e = if (end <= start) s else mapPosition(ops, end - 1) + 1
    (s, e)
  }
}
