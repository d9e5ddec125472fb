package graft

import java.nio.file.Files

import graft.operators.GraphSink
import org.apache.spark.sql.functions._

class GraphSinkSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_sink_").toString

  test("resume after partial write ≡ fresh full run (idempotent commit)") {
    val cfg = Pipeline.Config(nConvs = 20, nBase = 48)
    val triples = Pipeline.triples(spark, cfg).toDF()

    // fresh full run
    val freshDir = tmp()
    GraphSink.writeResumable(triples, freshDir, "run_full", nBuckets = 8)
    val fresh = GraphSink.readTriples(spark, freshDir).drop("bucket")
      .collect().toSet

    // crashed run: only half the buckets committed, then resume
    val resumeDir = tmp()
    val n1 = GraphSink.writeResumable(triples, resumeDir, "run_a", nBuckets = 8,
      onlyBuckets = Some(Seq(0L, 1L, 2L, 3L)))
    assert(n1 <= 4)
    val n2 = GraphSink.writeResumable(triples, resumeDir, "run_b", nBuckets = 8)
    val resumed = GraphSink.readTriples(spark, resumeDir).drop("bucket")
      .collect().toSet
    assert(resumed === fresh)
    // second resume is a no-op: every bucket already committed
    val n3 = GraphSink.writeResumable(triples, resumeDir, "run_c", nBuckets = 8)
    assert(n3 === 0)

    // manifest lineage: per-bucket counts + checksums cover the whole table
    val manifest = spark.read.parquet(GraphSink.manifestPath(resumeDir))
    val total = manifest.agg(sum(col("triple_count"))).head().getLong(0)
    assert(total === fresh.size.toLong)
    val recomputed = GraphSink.metrics(
      GraphSink.readTriples(spark, resumeDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val recorded = manifest.select("bucket", "triple_count", "checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(recomputed === recorded)
  }
}
