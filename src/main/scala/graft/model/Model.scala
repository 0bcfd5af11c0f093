package graft.model

import java.sql.Timestamp

/** Typed row models for every pipeline stage (case class = schema = Encoder).
  *
  * Mirrors the reference property-graph model (reference:
  * api/value/CypherEntity.scala:18-43 — MemNode(id, labels, properties),
  * MemRelationship(id, source, target, relType, properties)) re-expressed as
  * fixed-schema Spark rows per SURVEY.md §1.4.
  */

/** One transcript turn — the authoritative input shape (BASELINE.json input_hint):
  * (conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable: null unless role == "tool"
    ts: Timestamp)

/** An entity mention detected in a turn's text. `norm` is the normalized
  * surface used for linking; (begin, end) is the char span in the turn text.
  */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    surface: String,
    norm: String,
    begin: Int,
    end: Int)

/** A raw (subj, pred, obj) triple extracted from one turn, pre-linking.
  * Provenance: (conv_id, turn_idx) + the sentence index within the turn.
  */
final case class RawTriple(
    conv_id: String,
    turn_idx: Int,
    sent_idx: Int,
    subj: String,
    pred: String,
    obj: String)

/** Triple after entity linking: surfaces resolved to entity ids (xx64 of the
  * canonical name) where the dictionary/LSH matched; unresolved surfaces keep
  * a surface-derived id so canonicalization can still cluster them.
  * link_method ∈ {dict, lsh, surface}.
  */
final case class LinkedTriple(
    conv_id: String,
    turn_idx: Int,
    sent_idx: Int,
    subj_id: Long,
    subj_name: String,
    pred: String,
    obj_id: Long,
    obj_name: String,
    link_method: String)

/** Triple after connected-components canonicalization: ids replaced by the
  * component-canonical entity id/name.
  */
final case class CanonTriple(
    conv_id: String,
    turn_idx: Int,
    sent_idx: Int,
    subj_id: Long,
    subj_name: String,
    pred: String,
    obj_id: Long,
    obj_name: String)

/** Node table row (reference: api/MemCypherGraph.scala:118-127 flattens a node
  * to one wide row). Properties that the pipeline knows about are typed,
  * top-level, nullable columns.
  */
final case class NodeRow(
    id: Long,
    name: String,
    labels: Seq[String],
    n_mentions: Long,
    sample_conv_ids: Seq[String])

/** Edge table row (reference: api/MemCypherGraph.scala:129-140). One rel_type
  * per edge; provenance columns carry (conv_id, turn_idx).
  */
final case class EdgeRow(
    id: Long,
    src: Long,
    dst: Long,
    rel_type: String,
    conv_id: String,
    turn_idx: Int)

/** Alias-dictionary entry for entity linking (broadcast-sized). */
final case class AliasEntry(
    alias: String, // normalized surface form
    canonical_id: Long,
    canonical_name: String,
    entity_type: String)

/** Gold triple emitted by the deterministic generator alongside the text —
  * the P/R gate compares extractor output against these (FIXTURES.md §3).
  */
final case class GoldTriple(
    conv_id: String,
    turn_idx: Int,
    subj: String,
    pred: String,
    obj: String)
