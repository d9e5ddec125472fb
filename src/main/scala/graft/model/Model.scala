package graft.model

import java.sql.Timestamp

/** Core row types (FIXTURES.md §1-3; graft input_hint).
  *
  * `Turn` is the engine's input row — the transcript analogue of the
  * reference's paragraph (reference `src/app.py:89-102`); `GazRow` mirrors
  * the filtered MRCONSO projection CUI|SAB|TTY|ISPREF|CODE|STR
  * (reference `src/es_helper/create_filtered_data.py:79`).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

final case class GazRow(
    cui: String,
    sab: String,
    tty: String,
    ispref: String,
    code: String,
    str: String)

/** One ≤10-line segment of a turn (reference re-chunk loop
  * `src/app.py:218-224,305-311`); `seg_start` = char offset of the segment
  * within the turn text so mention offsets map back exactly. */
final case class Segment(
    conv_id: String,
    turn_idx: Int,
    seg_idx: Int,
    seg_start: Int,
    seg_text: String)

/** A detected mention span in TURN coordinates (reference span table
  * `index|chunk|cui|source|code|string|acc`,
  * `src/small_tasks/dhp_fhir_tool1_v1.py:220-249`). `try_index` ∈ 0..2 is
  * the ensemble round (reference `src/app.py:957-966`). */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    try_index: Int,
    start: Int,
    end: Int,
    surface: String,
    cui: String,
    source: String,
    code: String,
    concept_name: String,
    acc: Double)

/** Post-voting span cluster result (reference `src/algorithms/voting.py:124-128`). */
final case class VotedMention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    cui: String,
    source: String,
    code: String,
    concept_name: String,
    support: Double)

/** Final KG edge (reference entity row `src/app.py:1007-1026` reshaped as
  * (subj, pred, obj) + qualifiers; FIXTURES.md §3). */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    conv_id: String,
    confidence: Double,
    unique_count: Int,
    total_count: Int,
    icd10_code: Option[String],
    icd10_name: Option[String])
