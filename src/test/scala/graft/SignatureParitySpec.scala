package graft

import graft.functions.SignatureExprs
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native codegen'd signature expressions must be BIT-IDENTICAL to the
  * higher-order-function reference forms in Dedup — on real corpus text and
  * on adversarial edge cases (empty, whitespace-only, unicode, digits). */
class SignatureParitySpec extends GraftSuite {
  import spark.implicits._

  private lazy val corpora = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val edges = Seq("", " ", "\n\n", "a", "ab cd", "ÜNÏCÖDE Ünïcödé mixed",
      "123 456 789", "a-b_c.d", "中文 測試 words between 中文",
      "tabs\tand\nnewlines\r\nand  double  spaces",
      "ALL CAPS TEXT WITH numbers 42 AND symbols !!!").toDF("text")
    docs.unionByName(edges)
  }

  test("simhash64 native == HOF on corpus + edge cases") {
    val diff = corpora
      .select(SignatureExprs.simhash64(col("text")).as("a"),
        Dedup.simhash64(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("shingleHashes native == HOF shingles on corpus + edge cases") {
    val diff = corpora
      .select(SignatureExprs.shingleHashes(col("text"), 3).as("a"),
        Dedup.shingles(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("minhashSig native == HOF minhashSignature on corpus + edge cases") {
    val diff = corpora
      .select(SignatureExprs.minhashSig(col("text"), 32, 3).as("a"),
        Dedup.minhashSignature(col("text"), 32, 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("cosine native == HOF on real embeddings and degenerate vectors") {
    import graft.operators.Similarity
    // same-length vectors only: the HOF form nulls out on length mismatch
    // (zip_with padding), the native kernel truncates — malformed input,
    // out of contract for both
    val zeros = Seq(Seq.fill(64)(0f)).toDF("v")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("v"))
      .unionByName(zeros)
    val q = array((1 to 64).map(i => lit(i / 64.0)): _*)
    val diff = emb
      .select(Similarity.cosine(col("v"), q).as("a"),
        Similarity.cosineHof(col("v"), q).as("b"))
      .filter(!(col("a") <=> col("b"))).count() // bit-exact: no tolerance
    assert(diff == 0)
  }

  test("SQL-surface registration: named functions plan the identical kernels") {
    import graft.functions.GraftFunctions
    GraftFunctions.registerAll(spark) // extensions also inject at build time
    corpora.createOrReplaceTempView("sig_corpus")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(text) AS s,
        |graft_minhash_sig(text, 32, 3) AS m,
        |graft_shingle_hashes(text, 3) AS h FROM sig_corpus""".stripMargin)
    val viaCols = corpora.select(
      SignatureExprs.simhash64(col("text")).as("s"),
      SignatureExprs.minhashSig(col("text"), 32, 3).as("m"),
      SignatureExprs.shingleHashes(col("text"), 3).as("h"))
    assert(viaSql.collect().map(_.toString).sorted
      .sameElements(viaCols.collect().map(_.toString).sorted))
    // SQL-planned kernels stay in whole-stage codegen too
    assert(viaSql.queryExecution.executedPlan.toString.contains("*(1) Project"))
    // cosine by name == Column API, on real embeddings
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb_sig")
    val a = spark.sql(
      """SELECT vec_id, graft_cosine(embedding, embedding) AS c
        |FROM emb_sig""".stripMargin).collect().map(_.toString).sorted
    val b = emb.select(col("vec_id"),
        graft.operators.Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("native expressions stay inside whole-stage codegen") {
    val plan = corpora
      .select(SignatureExprs.simhash64(col("text")).as("s"),
        SignatureExprs.minhashSig(col("text"), 32, 3).as("m"))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is the WholeStageCodegen marker in the
    // compact plan string; a codegen fallback would print a bare Project
    assert(plan.contains("*(1) Project"), plan)
  }
}
