package graft

import java.nio.file.Files

import graft.operators._
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

/** Round-6 fixes: the streaming fold-and-retire lifecycle (VERDICT r5 next
  * #3), meta-as-commit-marker epoch gating in the index probe (ADVICE r5),
  * IVF compaction parity (ADVICE r5), and the Hadoop-FS port of the
  * streaming filesystem walks exercised through an explicit `file:` scheme
  * path (VERDICT r5 next #7). */
class Round6Spec extends GraftSuite {
  import spark.implicits._

  private def rmAll(paths: String*): Unit = paths.foreach { p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p.stripPrefix("file://")))
  }

  test("fold-and-retire: stream 4 batches, fold after 2, stream 2 more — " +
      "accepted == one-shot batch rule (chain across the fold boundary), " +
      "seen tail holds only post-fold batches, re-fold is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def words(seed: Int, n: Int) = (seed until seed + n).map(i => s"f$i")
    def doc(seed: Int, n: Int) = words(seed, n).mkString(" ")
    // chain fixture crossing the FOLD boundary (the semantics the fold
    // must preserve: a dead doc folded into the index still kills its
    // later twin): corpus a ≈ b (batch 1, dies), b ≈ c (batch 2 — AFTER
    // the fold of batches 0-1), a ̸≈ c. Same Jaccard arithmetic as the
    // Round5 chain test: J(a,b)≈0.559, J(b,c)≈0.915, J(a,c)≈0.493.
    val aText = words(0, 40).mkString(" ")
    val bText = (words(0, 40) ++ words(50000, 30)).mkString(" ")
    val cText = (words(0, 40).updated(20, "zz") ++ words(50000, 30))
      .mkString(" ")
    val corpus = Seq((0L, aText), (1L, doc(90000, 40)), (2L, doc(80000, 40)))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (100L, doc(80000, 40) + " x"), // near-dup of corpus 2 → dies (index)
      (101L, doc(60000, 40)))        // unique → accepted
    val b2 = Seq(
      (200L, bText),                 // chain: dies vs corpus a
      (201L, doc(70000, 40)))        // unique → accepted
    val b3 = Seq(
      (300L, cText),                 // chain: must die vs FOLDED dead 200
      (301L, doc(61000, 40)))        // unique → accepted
    val b4 = Seq(
      (400L, doc(61000, 40) + " y"), // near-dup of post-fold tail 301 → dies
      (401L, doc(62000, 40)))        // unique → accepted
    // two identical indexes: `idx` is streamed against (and mutated by the
    // fold); `idx0` stays pristine for the one-shot batch-rule oracle
    val idx = Files.createTempDirectory("graft_fold_idx_").toString
    val idx0 = Files.createTempDirectory("graft_fold_idx0_").toString
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx0)
    // the streaming state dir goes through an EXPLICIT file: scheme so the
    // Hadoop-FS port is exercised with a real URI, not a bare local path
    val outLocal = Files.createTempDirectory("graft_fold_out_").toString
    val out = s"file://$outLocal"
    val ck = Files.createTempDirectory("graft_fold_ck_").toString
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF.select($"_1".as("doc_id"), $"_2".as("text"))
    val q1 = StreamingDedup.start(stream, idx, out, ck)
    try {
      ms.addData(b1); q1.processAllAvailable()
      ms.addData(b2); q1.processAllAvailable()
    } finally q1.stop()
    val nIndexedBefore = Dedup.indexedDocCount(spark, idx)
    // ---- fold batches 0-1 into the index, retire their dirs ----
    StreamingDedup.foldAndRetire(spark, idx, out, uptoBatch = 1L)
    // all 4 seen docs (accepted AND dead) are now in the index's kill set
    assert(Dedup.indexedDocCount(spark, idx) == nIndexedBefore + 4)
    // the retired batch dirs are gone; the seen tail is empty pre-batch-3
    def seenBatches(): Set[String] = {
      val d = new java.io.File(s"$outLocal/seen")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("batch_id=")).toSet
    }
    assert(seenBatches() == Set.empty)
    assert(!new java.io.File(s"$outLocal/accepted/batch_id=0").exists())
    // accepted survivors of the folded range moved to accepted_folded
    assert(StreamingDedup.readAccepted(spark, out)
      .select($"doc_id").as[Long].collect().toSet == Set(101L, 201L))
    // re-fold of the same range: covered set empty → no-op, count stable
    StreamingDedup.foldAndRetire(spark, idx, out, uptoBatch = 1L)
    assert(Dedup.indexedDocCount(spark, idx) == nIndexedBefore + 4)
    // ---- resume the stream from the same checkpoint: batches 2, 3 ----
    val q2 = StreamingDedup.start(stream, idx, out, ck)
    try {
      ms.addData(b3); q2.processAllAvailable()
      ms.addData(b4); q2.processAllAvailable()
    } finally q2.stop()
    // the post-fold seen tail touches ONLY post-fold batches
    assert(seenBatches() == Set("batch_id=2", "batch_id=3"))
    val accepted = StreamingDedup.readAccepted(spark, out)
    // batch_id is long in the merged folded+tail readback (ADVICE r5)
    assert(accepted.schema("batch_id").dataType ==
      org.apache.spark.sql.types.LongType)
    val acceptedIds = accepted.select($"doc_id").as[Long].collect().toSet
    // 300 (chain twin of folded dead 200) must be dead — killed by the
    // INDEX probe now, since the seen tail no longer holds batch 1
    val oneShot = Dedup.incrementalNewDocs(spark, idx0,
        (b1 ++ b2 ++ b3 ++ b4).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(acceptedIds == oneShot)
    assert(acceptedIds == Set(101L, 201L, 301L, 401L))
    rmAll(idx, idx0, outLocal, ck)
  }

  test("full index lifecycle: stream -> fold -> blue/green compact -> " +
      "pointer flip -> stream on, with a second fold at a monotonic epoch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def doc(seed: Int, n: Int) = (seed until seed + n).map(i => s"l$i").mkString(" ")
    val corpus = Seq((0L, doc(0, 40)), (1L, doc(90000, 40)))
      .toDF("doc_id", "text")
    val b1 = Seq((100L, doc(0, 40) + " x"),   // dies vs corpus 0
                 (101L, doc(60000, 40)))      // accepted
    val b2 = Seq((200L, doc(70000, 40)))      // accepted
    val b3 = Seq((300L, doc(60000, 40) + " y"), // dies vs FOLDED+COMPACTED 101
                 (301L, doc(62000, 40)))        // accepted
    val b4 = Seq((400L, doc(62000, 40) + " z")) // dies vs post-flip tail 301
    val idx = Files.createTempDirectory("graft_lc_idx_").toString
    val idx0 = Files.createTempDirectory("graft_lc_idx0_").toString
    val idx2 = Files.createTempDirectory("graft_lc_idx2_").toString + "/green"
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx0)
    val out = Files.createTempDirectory("graft_lc_out_").toString
    val ck = Files.createTempDirectory("graft_lc_ck_").toString
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF.select($"_1".as("doc_id"), $"_2".as("text"))
    val q1 = StreamingDedup.start(stream, idx, out, ck)
    try {
      ms.addData(b1); q1.processAllAvailable()
      ms.addData(b2); q1.processAllAvailable()
    } finally q1.stop()
    // fold batches 0-1 (epoch 2), then compact blue -> green and FLIP
    StreamingDedup.foldAndRetire(spark, idx, out, uptoBatch = 1L)
    Dedup.compactMinhashIndex(spark, idx, idx2)
    // compaction preserves the probe AND the doc-count cap basis
    assert(Dedup.indexedDocCount(spark, idx2) ==
      Dedup.indexedDocCount(spark, idx))
    val q2 = StreamingDedup.start(stream, idx2, out, ck)
    try {
      ms.addData(b3); q2.processAllAvailable()
      ms.addData(b4); q2.processAllAvailable()
    } finally q2.stop()
    // second fold AGAINST THE COMPACTED index: epoch = 3+1 = 4 > the
    // compacted copy's epoch 0 — monotonic by construction, never reused
    StreamingDedup.foldAndRetire(spark, idx2, out, uptoBatch = 3L)
    assert(spark.read.parquet(s"$idx2/meta")
      .select($"epoch".cast("long")).collect().map(_.getLong(0)).toSet ==
      Set(0L, 4L))
    val acceptedIds = StreamingDedup.readAccepted(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    val oneShot = Dedup.incrementalNewDocs(spark, idx0,
        (b1 ++ b2 ++ b3 ++ b4).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(acceptedIds == oneShot)
    assert(acceptedIds == Set(101L, 200L, 301L))
    rmAll(idx, idx0, idx2, out, ck)
  }

  test("a half-appended epoch (no meta commit marker) is invisible to the " +
      "probe; the retried append completes it") {
    def doc(seed: Int, n: Int) = (seed to seed + n).map(i => s"h$i").mkString(" ")
    val corpus = (0 until 6).map(i => (i.toLong, doc(i * 1000, 40)))
      .toDF("doc_id", "text")
    val idx = Files.createTempDirectory("graft_half_idx_").toString
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    val delta = Seq((100L, doc(50000, 40))).toDF("doc_id", "text")
    val probe = Seq((300L, doc(50000, 40) + " q")).toDF("doc_id", "text")
    def pairs() = Dedup.incrementalTrueJaccardPairs(spark, idx, probe,
        "doc_id", "text")
      .select($"id_a".cast("long"), $"id_b".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() == Set.empty) // 50000-series not indexed yet
    // simulate the append crashing AFTER bands+docs, BEFORE meta (meta is
    // written last = the commit marker): append fully, then remove the
    // epoch's meta partition
    Dedup.appendToMinhashIndex(delta, "doc_id", "text", idx, epoch = 1L)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$idx/meta/epoch=1"))
    // bands/docs rows for epoch 1 exist on disk…
    assert(spark.read.parquet(s"$idx/bands")
      .filter($"epoch" === 1).count() > 0)
    // …but the probe must not see them (no partial-epoch candidates, and
    // the cap basis == the committed doc count)
    assert(pairs() == Set.empty)
    assert(Dedup.indexedDocCount(spark, idx) == 6)
    // the retried append completes the epoch; the probe now pairs
    Dedup.appendToMinhashIndex(delta, "doc_id", "text", idx, epoch = 1L)
    assert(pairs() == Set((100L, 300L)))
    rmAll(idx)
  }

  test("recall detail rows aggregate to the summary form and carry exactly " +
      "k exact-neighbor rows per query (the DuckDB-recomputable denominator)") {
    def doc(seed: Int, dims: Int = 12) = (0 until dims)
      .map(d => (((seed * 31 + d * 7) % 19).toDouble / 19.0 - 0.5).toFloat).toSeq
    val emb = (0 until 60).map(i => (i.toLong, doc(i))).toDF("vec_id", "embedding")
      .cache(); emb.count()
    val queries = (0 until 4).map { i =>
      (i.toLong, doc(i).map(_.toDouble).toSeq)
    }
    val idx = Files.createTempDirectory("graft_r6_detail_").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nCentroids = 4)
    val detail = Similarity.ivfRecallIndexed(spark, idx, "vec_id", "embedding",
      queries, 5, nProbe = 2, detail = true)
    // exactly k rows per query — every query's full exact top-5, hit or not
    assert(detail.groupBy($"query_id").count()
      .filter($"count" =!= 5).count() == 0)
    // detail aggregates to the summary form exactly
    val fromDetail = detail.groupBy($"query_id")
      .agg(sum($"hit").cast("long").as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val summary = Similarity.ivfRecallIndexed(spark, idx, "vec_id", "embedding",
        queries, 5, nProbe = 2)
      .select($"query_id", $"n_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDetail == summary)
    // the detail's (query_id, vec_id, cos) triples ARE the exact top-5:
    // parity with bruteForceTopK per query
    val q0 = queries.head._2
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val det0 = detail.filter($"query_id" === 0L)
      .select($"vec_id", $"cos")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(det0 == exact)
    rmAll(idx)
    emb.unpersist()
  }

  test("IVF index compaction preserves the codebook and probe parity " +
      "(src vs dst, pruned and full probing)") {
    def clustered(n: Int, nClusters: Int, dims: Int = 16) = {
      def h(i: Int, j: Int): Double =
        (((i * 2654435761L + j * 40503L) % 1000L).toDouble / 1000.0 - 0.5) * 0.1
      (0 until n).map { i =>
        val c = i % nClusters
        val base = Array.tabulate(dims)(d => if (d == c) 1.0 else 0.0)
        (i.toLong, base.zipWithIndex.map { case (v, d) => (v + h(i, d)).toFloat }.toSeq)
      }.toDF("vec_id", "embedding")
    }
    val base = clustered(120, 6).cache(); base.count()
    val src = Files.createTempDirectory("graft_ivfc_src_").toString
    val dst = Files.createTempDirectory("graft_ivfc_dst_").toString + "/idx"
    Similarity.buildIvfIndex(base.filter($"vec_id" < 90), "vec_id",
      "embedding", src, nCentroids = 6)
    Similarity.appendToIvfIndex(base.filter($"vec_id" >= 90), "vec_id",
      "embedding", src, epoch = 1L)
    Similarity.compactVectorIndex(spark, src, dst, "ivf_cid")
    // codebook copied verbatim (it is what routes probes)
    def cb(p: String) = spark.read.parquet(s"$p/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(cb(dst) == cb(src))
    assert(spark.read.parquet(s"$dst/vectors").count() == 120)
    val q = base.filter($"vec_id" === 93).head().getSeq[Float](1)
      .map(_.toDouble).toSeq
    def top(p: String, nProbe: Int) = Similarity.ivfTopKIndexed(spark, p,
        "vec_id", "embedding", q, 7, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(dst, 1) == top(src, 1)) // pruned probe parity
    assert(top(dst, 6) == top(src, 6)) // full probe parity
    rmAll(src, dst)
    base.unpersist()
  }
}
