package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphTables, PatternMatch}

/** Pinned capability blacklist in the spirit of the reference's TCK runner
  * (tck/TckMemCypherTest.scala:46-57: blacklisted scenarios are ASSERTED to
  * fail, so a capability gained or lost without updating the pin breaks the
  * build). Three layers of pinning:
  *
  *  1. the supported/unsupported sets are mirrored here verbatim — editing
  *     Capabilities without editing this spec fails;
  *  2. the PatternMatch public surface is pinned by reflection — adding e.g.
  *     a varLengthExpand method without updating the pin fails;
  *  3. every supported capability that maps to a SparkEntry query key is
  *     checked to exist in the driver contract.
  */
class CapabilitySpec extends AnyFunSuite {

  test("supported capability set is pinned (drift requires a two-file edit)") {
    val pinned = Set(
      "start_unit_table", "driving_table", "cypher_match_subset",
      "cypher_rel_binding", "cypher_return_aggregates", "cypher_multi_pattern",
      "cypher_with", "cypher_optional_match", "cypher_union_all",
      "var_length_expand", "shortest_path",
      "node_scan_label_pruned", "rel_scan_type_pruned",
      "alias", "project", "select_fields", "drop", "remove_aliases",
      "filter_three_valued", "distinct", "aggregate", "order_by", "limit",
      "join_inner", "join_left_outer", "join_right_outer", "join_left_anti",
      "cartesian_product", "union_all", "expand", "expand_into", "optional_match",
      "triple_extraction", "mention_detection", "entity_linking_dict",
      "entity_linking_lsh", "connected_components", "canonicalization",
      "graph_materialize", "snapshot_resume", "snapshot_time_travel",
      "edge_list_tsv_source",
      "parquet_snapshot_sink", "dedup_exact", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_lsh",
      "similarity_brute_topk", "similarity_ann_lsh", "similarity_ann_ivf", "text_langid",
      "text_quality", "text_tokens", "text_fingerprint", "multimodal_meta",
      "multimodal_decode_png", "streaming_sessionize", "streaming_windowed_agg")
    assert(Capabilities.supported == pinned,
      s"supported drifted: +${Capabilities.supported -- pinned} -${pinned -- Capabilities.supported}")
  }

  test("unsupported capability blacklist is pinned") {
    val pinned = Set(
      "skip",
      "graph_union_all", "mutation_create", "mutation_merge", "mutation_set",
      "mutation_delete", "cypher_full_grammar", "multimodal_decode_jpeg",
      "multimodal_decode_webp")
    assert(Capabilities.unsupported == pinned,
      s"unsupported drifted: +${Capabilities.unsupported -- pinned} -${pinned -- Capabilities.unsupported}")
    assert(Capabilities.supported.intersect(Capabilities.unsupported).isEmpty)
  }

  test("PatternMatch public surface is exactly scan/from/expand/expandOptional/expandInto/expandVarLength (no silent surface gains)") {
    val declared = classOf[PatternMatch].getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers)
        && !java.lang.reflect.Modifier.isStatic(m.getModifiers)) // skip companion forwarders
      .map(_.getName)
      .filterNot(n => n.contains("$") || Set("nodes", "edges", // fields
        "copy", "equals", "hashCode", "toString", "productArity",
        "productPrefix", "productElement", "productIterator",
        "productElementName", "productElementNames", "canEqual").contains(n))
      .toSet
    assert(declared == Set("scan", "from", "expand", "expandOptional", "expandInto",
      "expandVarLength", "shortestPaths"),
      s"PatternMatch surface drifted: $declared — update Capabilities + this pin if intentional")
  }

  test("GraphTables has no graph union (reference MemCypherGraph.unionAll is unimplemented)") {
    val names = classOf[GraphTables].getDeclaredMethods.map(_.getName).toSet
    assert(!names.exists(n => n.toLowerCase.contains("union")),
      "graph union appeared without updating the capability blacklist")
  }

  test("driver contract covers the query-shaped supported capabilities") {
    val queryFor = Map(
      "start_unit_table" -> "q17_unit_start",
      "driving_table" -> "kg_match_driving",
      "cypher_match_subset" -> "kg_cypher",
      "cypher_rel_binding" -> "kg_cypher_rel",
      "cypher_return_aggregates" -> "kg_cypher_agg",
      "cypher_multi_pattern" -> "kg_cypher_multi",
      "cypher_with" -> "kg_cypher_with",
      "streaming_sessionize" -> "st_sessions",
      "streaming_windowed_agg" -> "st_windowed",
      "node_scan_label_pruned" -> "kg_match_demo",
      "rel_scan_type_pruned" -> "kg_match_2hop",
      "remove_aliases" -> "q18_remove_aliases",
      "expand" -> "kg_match_2hop",
      "expand_into" -> "kg_match_triangle",
      "var_length_expand" -> "kg_match_varlen",
      "shortest_path" -> "kg_match_shortest",
      "optional_match" -> "kg_match_optional",
      "edge_list_tsv_source" -> "el_bench",
      "dedup_embedding_lsh" -> "dd_embed_neardup",
      "multimodal_decode_png" -> "mm_decode",
      "connected_components" -> "kg_components",
      "graph_materialize" -> "kg_edges")
    queryFor.foreach { case (cap, q) =>
      assert(Capabilities.supported.contains(cap), s"$cap missing from supported")
      assert(SparkEntry.queries.contains(q), s"capability $cap lost its driver query $q")
    }
  }
}
