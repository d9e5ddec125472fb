package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted lexical candidate index — the analogue of the reference's
  * Elasticsearch alias index (SURVEY §2.1 S8; bulk-built once in
  * `/root/reference/es_docker/育暘_NER_ES.ipynb`, then served per query).
  * [[Linking.linkBySurface]] recomputes token idf from the gazetteer on
  * every invocation; at production scale the index is built ONCE:
  *
  *   postings(token, cui, sab, code, str, idf), partitioned by
  *   shard = hash(token) % NumShards
  *
  * and each query scores its distinct surfaces against ONLY the shards its
  * query tokens hash to — a partition-pruned read (asserted in tests), no
  * per-query idf pass. Scores are bit-identical to the on-the-fly path
  * (same formula at build time, both rounded to 9 dp; equality-tested). */
object LexicalIndex {

  val NumShards = 16

  /** One-time index build from the gazetteer (the ES `parallel_bulk`). */
  def build(gaz: DataFrame, path: String): Unit = {
    val aliasTok = gaz
      .select(col("cui"), col("sab"), col("code"), col("str"),
        explode(expr("array_distinct(split(lower(str), '[^a-z0-9]+'))")).as("token"))
      .filter(length(col("token")) > 0)
    val nAliases = gaz.agg(count(lit(1)).cast("double").as("n_aliases"))
    val idf = aliasTok.groupBy("token")
      .agg(countDistinct(col("sab"), col("code"), col("str")).as("df"))
      .crossJoin(broadcast(nAliases))
      .withColumn("idf", log(lit(1.0) + col("n_aliases") / col("df")))
      .select(col("token"), col("idf"))
    aliasTok.join(broadcast(idf), "token")
      .withColumn("shard", pmod(xxhash64(col("token")), lit(NumShards)))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/postings")
  }

  /** L1-L3 served from the persisted index: same output contract as
    * [[Linking.linkBySurface]] (mention_key, surface, candidates, rn,
    * selected). The shard set of the query tokens is collected first
    * (bounded by NumShards — a handful of longs) so the postings read is
    * partition-PRUNED; the scored per-surface rankings broadcast back onto
    * the mention stream exactly as the on-the-fly path does. */
  def linkBySurface(mentions: DataFrame, spark: SparkSession, path: String,
      topK: Int = 10): DataFrame = {
    val surfaces = mentions.select(col("surface")).distinct()
    val qTok = surfaces
      .select(col("surface"),
        explode(expr("array_distinct(split(lower(surface), '[^a-z0-9]+'))")).as("token"))
      .filter(length(col("token")) > 0)
    val shards = qTok
      .select(pmod(xxhash64(col("token")), lit(NumShards)).as("shard"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(shards: _*))
    val cand = broadcast(qTok).join(postings, "token")
      .groupBy(col("surface"), col("cui"), col("sab"), col("code"), col("str"))
      .agg(round(sum(col("idf")), 9).as("score"))
    val wTop = Window.partitionBy("surface")
      .orderBy(col("score").desc, length(col("str")).asc, col("code").asc, col("sab").asc)
    val perSurface = cand.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .withColumn("selected", col("rn") === 1)
    mentions
      .withColumn("mention_key",
        xxhash64(col("conv_id"), col("turn_idx"), col("try_index"),
          col("start"), col("end")))
      .select(col("mention_key"), col("surface"))
      .join(broadcast(perSurface), "surface")
  }
}
