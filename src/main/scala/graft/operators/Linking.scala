package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking (SURVEY.md §2.3 J1/J2, §2.11 L1-L4).
  *
  * The gazetteer is the DIMENSION side everywhere: a few hundred MB at
  * production scale vs TBs of mentions, so every join here is an explicit
  * `broadcast()` hash join — no shuffle of the fact side (reference holds
  * the whole `umls_df` in memory per process, `dhp_fhir_tool1_v1.py:65`).
  * The one exception is [[linkFaceted]]'s per-combo ranking, whose
  * cardinality is caller-data-driven — it broadcasts only under a counted
  * threshold and falls back to a shuffle join above it.
  */
object Linking {

  /** P2 preferred-term ranking (reference `dhp_fhir_tool1_v1.py:228-243`):
    * prefer ISPREF='Y'&&TTY='PT', then 'Y'&&'FN', then any 'Y', else
    * anything; deterministic tie-break on str. */
  def ttyRankCol: Column =
    when(col("ispref") === "Y" && col("tty") === "PT", 0)
      .when(col("ispref") === "Y" && col("tty") === "FN", 1)
      .when(col("ispref") === "Y", 2)
      .otherwise(3)

  /** (cui, sab, code) -> preferred concept_name. Ranked WITHIN each code
    * (not per (cui, sab)): a real UMLS carries several codes under one
    * (cui, sab), and a per-(cui,sab) winner would leave every non-preferred
    * code's mentions without a preferred name — the reference re-looks the
    * name up by SCUI alone (`dhp_fhir_tool1_v1.py:228-243`), i.e. per code. */
  def preferredPerCode(gaz: DataFrame): DataFrame = {
    val w = Window.partitionBy("cui", "sab", "code")
      .orderBy(col("rank"), col("str"))
    gaz.withColumn("rank", ttyRankCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cui"), col("sab"), col("code"),
        col("str").as("preferred_name"))
  }

  /** L4 ICD10CM crosswalk rows: cui -> first ICD10CM (code, name)
    * (reference `app.py:891-917`; miss -> N/A handled by the left join). */
  def icd10Crosswalk(gaz: DataFrame): DataFrame = {
    val w = Window.partitionBy("cui").orderBy(col("rank"), col("code"), col("str"))
    gaz.filter(col("sab") === "ICD10CM")
      .withColumn("rank", ttyRankCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cui"), col("code").as("icd10_code"), col("str").as("icd10_name"))
  }

  /** J1 + J2: enrich mentions with the preferred concept name of their own
    * vocabulary and the ICD10CM crosswalk. Both joins broadcast. */
  def link(mentions: DataFrame, gaz: DataFrame): DataFrame = {
    val pref = preferredPerCode(gaz)
      .withColumnRenamed("sab", "p_sab").withColumnRenamed("code", "p_code")
      .withColumnRenamed("cui", "p_cui")
    val xwalk = icd10Crosswalk(gaz).withColumnRenamed("cui", "x_cui")
    mentions
      .join(broadcast(pref),
        mentions("cui") === pref("p_cui") &&
          mentions("source") === pref("p_sab") &&
          mentions("code") === pref("p_code"), "left")
      .withColumn("concept_name", coalesce(col("preferred_name"), col("concept_name")))
      .drop("p_cui", "p_sab", "p_code", "preferred_name")
      .join(broadcast(xwalk), mentions("cui") === xwalk("x_cui"), "left")
      .drop("x_cui")
  }

  /** L1 candidate generation + L2 selection + L3 exact resolution, fully
    * lexical (the reference's ES `multi_match` + LLM pick,
    * `app.py:681-841`, made deterministic):
    *
    *   score(mention, alias) = Σ_{t ∈ tokens(surface) ∩ tokens(alias)} idf(t)
    *   idf(t) = ln(1 + N_aliases / df(t))
    *   best   = max by (score desc, length(alias) asc, code asc)
    *
    * All against the broadcast gazetteer; `topK` candidates kept per
    * mention (reference ES `"size": 10`, `app.py:720`). */
  def linkBySurface(mentions: DataFrame, gaz: DataFrame, topK: Int = 10): DataFrame = {
    // Scores depend only on the surface STRING, and dictionary-matched
    // surfaces have gazetteer-bounded cardinality — so score each DISTINCT
    // surface once and broadcast the results back onto the mention stream
    // (10^12 mentions, 10^5 surfaces: the expensive explode+join+window
    // runs on the 10^5 side).
    val surfaces = mentions.select(col("surface")).distinct()
    val cand = clauseScores(surfaces.select(col("surface").as("q")), gaz)
      .withColumnRenamed("q", "surface")

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

  /** The scoring algebra's single source of truth: idf-weighted alias
    * postings (token, cui, sab, code, str, idf) with
    * idf(t) = ln(1 + N_aliases / df(t)). Consumed in-flight by
    * [[clauseScores]] and written to disk by
    * [[LexicalIndex.build]] — ONE definition, so the persisted index's
    * score-identity contract can't drift out of sync. No driver actions:
    * the alias total joins in as a broadcast single-row aggregate. */
  def aliasPostings(gaz: DataFrame): DataFrame = {
    val aliasTok = gaz
      .select(col("cui"), col("sab"), col("code"), col("str"),
        explode(expr("array_distinct(split(lower(str), '[^a-z0-9]+'))")).as("token"))
      .filter(length(col("token")) > 0)
    val nAliases = gaz.agg(count(lit(1)).cast("double").as("n_aliases"))
    val idf = aliasTok.groupBy("token")
      .agg(countDistinct(col("sab"), col("code"), col("str")).as("df"))
      .crossJoin(broadcast(nAliases))
      .withColumn("idf", log(lit(1.0) + col("n_aliases") / col("df")))
      .drop("n_aliases", "df")
    aliasTok.join(broadcast(idf), "token")
  }

  /** One ES-should-clause analogue: idf-overlap score of every candidate
    * alias against each distinct query string `q` (the shared scoring core
    * of [[linkBySurface]] and [[linkFaceted]]). */
  def clauseScores(queries: DataFrame, gaz: DataFrame): DataFrame = {
    val qTok = queries
      .select(col("q"),
        explode(expr("array_distinct(split(lower(q), '[^a-z0-9]+'))")).as("token"))
      .filter(length(col("token")) > 0)
    // token-overlap join against the broadcast index, then two-phase agg
    qTok.join(broadcast(aliasPostings(gaz)), "token")
      .groupBy(col("q"), col("cui"), col("sab"), col("code"), col("str"))
      .agg(round(sum(col("idf")), 9).as("score"))
  }

  /** U4 faceted candidate search (reference `app.py:692-712`): the ES query
    * is a bool-should of the concept surface PLUS every facet keyword, each
    * a multi_match against the alias STR — a candidate's score is the sum
    * of its per-clause scores. `mentions` carries
    * `facets: map<string, array<string>>` (keyword_type -> keywords, the
    * reference's `search` dict); null/empty facets degrade to surface-only
    * scoring.
    *
    * Scale shape: scoring runs on DISTINCT (surface, facets) combos — maps
    * aren't groupable in Spark, so combos key on the sorted entry array.
    * Combo cardinality is CALLER-DATA-driven: dictionary-bounded when
    * facets come from a curated taxonomy, but near-|mentions| when facets
    * are free-form per-mention dicts (the reference's LLM-authored `search`
    * maps, `app.py:419-664`). The finished rankings are therefore counted
    * first and broadcast back onto the mention stream only below
    * `maxBroadcastCombos`; above it the final join is a plain shuffle join
    * (sort-merge / AQE's choice) — slower, but it cannot OOM the driver.
    * The count costs one extra partial-agg pass over the mention keys; at
    * 10^12 mentions that is the price of not gambling the driver on a
    * cardinality assumption. Every grouping/window/join key is the FULL
    * combo identity (qkey, surface, fentries) — the 64-bit qkey leads the
    * key only to make hashing/sorting cheap, so a qkey collision costs a
    * few comparisons, never a merged ranking or a dropped mention. */
  def linkFaceted(mentions: DataFrame, gaz: DataFrame, topK: Int = 10,
      maxBroadcastCombos: Long = 100000L): DataFrame = {
    // combo identity = (surface, sorted facet entries); the leading 64-bit
    // hash keeps the heavy comparisons rare (equal-hash rows only).
    // xxhash64 hashes the nested array<struct> directly — a to_json
    // serialization here measured ~20s CPU per consumer at sf0.1
    val comboKey = Seq("qkey", "surface", "fentries")
    // norm feeds the combo distinct AND the final mention join-back, and
    // the facet normalization (map_entries + sort_array + xxhash64 per
    // row) is the expensive part of both — persist so it runs once (r8;
    // profiled ~8-11 s CPU per consumer at sf0.1)
    val norm = mentions.withColumn("fentries",
      sort_array(map_entries(coalesce(col("facets"),
        expr("map()").cast("map<string,array<string>>")))))
      .withColumn("qkey", xxhash64(col("surface"), col("fentries")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val combos = norm.select(col("qkey"), col("surface"), col("fentries")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // clauses of a combo: the surface + every facet keyword. Each entry's
    // keyword array is null-coalesced FIRST — flatten() nulls out on any
    // null nested array, which would explode to zero clause rows and drop
    // the mention entirely instead of degrading to surface-only scoring
    val clauses = combos.select(col("qkey"), col("surface"), col("fentries"),
      explode(concat(array(col("surface")),
        flatten(transform(col("fentries"),
          e => coalesce(e.getField("value"), array()))))).as("q"))
    val perClause = clauseScores(clauses.select("q").distinct(), gaz)
    val scored = clauses.join(broadcast(perClause), "q")
      .groupBy(col("qkey"), col("surface"), col("fentries"),
        col("cui"), col("sab"), col("code"), col("str"))
      .agg(round(sum(col("score")), 9).as("score"))
    val wTop = Window.partitionBy(comboKey.map(col): _*)
      .orderBy(col("score").desc, length(col("str")).asc, col("code").asc, col("sab").asc)
    val perCombo = scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .withColumn("selected", col("rn") === 1)

    val nCombos = combos.count()
    val ranked =
      if (nCombos <= maxBroadcastCombos) broadcast(perCombo) else perCombo
    norm
      .withColumn("mention_key",
        xxhash64(col("conv_id"), col("turn_idx"), col("try_index"),
          col("start"), col("end")))
      .select(col("mention_key"), col("qkey"), col("surface"), col("fentries"))
      .join(ranked, comboKey)
      .drop("qkey", "fentries")
  }
}
