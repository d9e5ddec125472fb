package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract): one JSON line with per-query
  * seconds at local[32], plus the north-rule scaling evidence — the
  * flagship KG pipeline (transcripts → triples) run at local[8] and
  * local[32] on the same input, reporting triples/sec at both and the
  * scaling efficiency thr(32) / (4 × thr(8)) (BASELINE.md "Targets").
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** (triples counted, seconds) for one full KG pipeline run. */
  private def kgRun(spark: SparkSession, sfDir: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = Pipeline.triples(spark, SparkEntry.cfgOf(sfDir)).count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loCores = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "8").toInt
    val hiCores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- scaling evidence: same job, N vs 4N cores (fresh session each) ---
    val sLo = session(loCores)
    kgRun(sLo, sfDir) // JIT/codegen warm-up; synthetic input => no disk cache skew
    val (nLo, secLo) = kgRun(sLo, sfDir)
    sLo.stop()
    val sHi = session(hiCores)
    kgRun(sHi, sfDir)
    val (nHi, secHi) = kgRun(sHi, sfDir)
    val thrLo = nLo / secLo
    val thrHi = nHi / secHi
    val eff = thrHi / ((hiCores.toDouble / loCores) * thrLo)

    // --- per-query timings at local[hi] ---
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sHi, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling = f"""{"cores_lo":$loCores,"cores_hi":$hiCores,""" +
      f""""triples":$nHi,"sec_lo":$secLo%.3f,"sec_hi":$secHi%.3f,""" +
      f""""triples_per_sec_lo":$thrLo%.1f,"triples_per_sec_hi":$thrHi%.1f,""" +
      f""""efficiency":$eff%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      f""""triples_per_sec":$thrHi%.1f,"scaling":$scaling,""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
    sHi.stop()
  }
}
