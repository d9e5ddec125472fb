package graft.util

/** Deterministic hashing for all synthetic data + stable ids.
  *
  * The reference mints ids with `uuid.uuid4()` and wall-clock timestamps
  * (reference `src/app.py:1183-1185`); for reproducibility every id in this
  * engine is a pure function of its inputs (SURVEY.md §2.8 F3). splitmix64
  * finalizer (public-domain constant set, Steele et al. 2014).
  */
object DetHash {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine any number of longs into one stable hash. */
  def h(parts: Long*): Long =
    parts.foldLeft(0x2545f4914f6cdd1dL)((acc, p) => mix(acc ^ mix(p)))

  // Fixed-arity overloads of the SAME fold (bit-identical results, asserted
  // in PropertySpec): the varargs form allocates a boxed Seq per call, and
  // synthesis calls h once per generated WORD — it profiled at ~15% of all
  // pipeline executor samples before these (r7).
  private val Seed = 0x2545f4914f6cdd1dL
  def h(a: Long, b: Long): Long =
    mix(mix(Seed ^ mix(a)) ^ mix(b))
  def h(a: Long, b: Long, c: Long): Long =
    mix(h(a, b) ^ mix(c))
  def h(a: Long, b: Long, c: Long, d: Long): Long =
    mix(h(a, b, c) ^ mix(d))
  def h(a: Long, b: Long, c: Long, d: Long, e: Long): Long =
    mix(h(a, b, c, d) ^ mix(e))
  def h(a: Long, b: Long, c: Long, d: Long, e: Long, f: Long): Long =
    mix(h(a, b, c, d, e) ^ mix(f))

  /** Deterministic string hash (not JVM hashCode-dependent semantics-wise,
    * but String.hashCode is itself specified by the JLS so this is stable). */
  def hs(s: String): Long = {
    var a = 1125899906842597L
    var i = 0
    while (i < s.length) { a = 31 * a + s.charAt(i); i += 1 }
    mix(a)
  }

  /** Non-negative bucket of a hash. */
  def pos(x: Long, n: Int): Int = {
    val m = (x % n).toInt
    if (m < 0) m + n else m
  }
}
