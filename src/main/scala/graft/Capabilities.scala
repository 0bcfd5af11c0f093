package graft

/** Pinned capability registry — the Spark-native analog of the reference's
  * TCK blacklist (reference: tck/TckMemCypherTest.scala:46-57, where
  * unsupported scenarios are *asserted* to fail so capability drift is
  * loud). Here the engine's supported / deliberately-unsupported surface is
  * pinned as data; CapabilitySpec asserts the pins against the actual API by
  * reflection, so silently gaining or losing a capability breaks the build
  * instead of passing unnoticed.
  *
  * A capability moves between sets only via an explicit edit here AND in the
  * spec's mirrored copy — a two-file change that cannot happen by accident.
  */
object Capabilities {

  /** Implemented operator/feature surface (SURVEY.md §2 inventory; each has
    * a SparkEntry query and/or a dedicated spec).
    */
  val supported: Set[String] = Set(
    // reference operator algebra (SURVEY.md §2.1)
    "start_unit_table",
    // driving-table entry: seed a pattern from an existing DataFrame
    // (reference api/MemCypherSession.scala:70-71 cypher(..., drivingTable))
    "driving_table",
    // string-query entry for the reference's own MATCH fragment
    // (api/MemCypherSession.scala:76; parser = graph/CypherLite.scala)
    "cypher_match_subset",
    // round 5: relationship variables with type/startNode/endNode (reference
    // rel-value surface, impl/value/CypherMapOps.scala:43-45 + rel rows at
    // api/MemCypherGraph.scala:129-140), aggregating RETURN with implicit
    // grouping (api/MemCypherRecords.scala:99-162), and multi-pattern MATCH
    // planned CartesianProduct-style (MemOperatorProducer.scala:115-118)
    "cypher_rel_binding",
    "cypher_return_aggregates",
    "cypher_multi_pattern",
    // round 5: WITH query-part chaining (projection/aliasing, implicit-
    // grouping aggregation, DISTINCT, post-WITH WHERE, follow-up MATCH) —
    // the reference runs the TCK WithAcceptance scenarios green (only 7 of
    // them are blacklisted: ORDER BY/SKIP/LIMIT-in-WITH, nested maps, null
    // projection — those stay out here too)
    "cypher_with",
    // round 5: the last two string-entry gaps vs the reference planner's
    // operator set — OPTIONAL MATCH (pre-join WHERE, left-outer-joined on
    // shared node ids; reference LeftOuterJoin, BinaryOperator.scala:58-60)
    // and UNION ALL between full queries (reference TabularUnionAll,
    // BinaryOperator.scala:75-80)
    "cypher_optional_match",
    "cypher_union_all",
    // round 5, BEYOND the reference (its planner SPI stubs *1..n as
    // unimplemented, MemOperatorProducer.scala:124-142): bounded
    // variable-length expand with Cypher path semantics (one row per path,
    // relationship uniqueness), iterative frontier-join plan
    "var_length_expand",
    // round 5, BEYOND the reference (TCK-blacklisted there): shortest-path
    // lengths via level-synchronous BFS with frontier dedup (reachability
    // form — path contents are not bound)
    "shortest_path",
    "node_scan_label_pruned",
    "rel_scan_type_pruned",
    "alias",
    "project",
    "select_fields",
    "drop",
    "remove_aliases",
    "filter_three_valued",
    "distinct",
    "aggregate",
    "order_by",
    "limit", // beyond the reference (it lacks LIMIT/SKIP)
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "join_left_anti", // beyond the reference
    "cartesian_product",
    "union_all",
    "expand",
    "expand_into",
    // round 4: one-hop optional expand (OPTIONAL MATCH's shape) — planned as
    // a left-outer join like the reference's outer-join operators
    // (impl/planning/BinaryOperator.scala:58-59); PatternMatch.expandOptional
    "optional_match",
    // pipeline stages (BASELINE.json north_star)
    "triple_extraction",
    "mention_detection",
    "entity_linking_dict",
    "entity_linking_lsh",
    "connected_components",
    "canonicalization",
    "graph_materialize",
    "snapshot_resume",
    // round 5: Iceberg VERSION-AS-OF reads — committed snapshots are
    // immutable, TableIO.readAt/snapshotIds serve any historical version
    "snapshot_time_travel",
    // sources/sinks
    "edge_list_tsv_source",
    "parquet_snapshot_sink",
    // training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "similarity_brute_topk",
    "similarity_ann_lsh",
    // round 5: IVF inverted-file ANN (k-means coarse cells, nProbe probing)
    "similarity_ann_ivf",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "multimodal_meta",
    "multimodal_decode_png",
    "streaming_sessionize",
    "streaming_windowed_agg")

  /** Deliberately unsupported — mirrors the reference's own blacklist
    * (CREATE/MERGE/SET/DELETE and graph union are TCK-blacklisted or
    * unimplemented there; SURVEY.md §2.3/§5) plus surfaces out of scope by
    * the north rule. Var-length expand and shortest path, blacklisted in the
    * reference, moved to `supported` in round 5 (bounded, beyond-reference).
    * Each entry is a promise: no API exists for it, and CapabilitySpec fails
    * if one appears.
    */
  val unsupported: Set[String] = Set(
    "skip", // reference lacks SKIP
    "graph_union_all", // reference MemCypherGraph.unionAll = unimplemented
    "mutation_create",
    "mutation_merge",
    "mutation_set",
    "mutation_delete",
    // round 3: the MATCH fragment the reference's own tests/apps exercise IS
    // supported as a string entry (CypherLite, `cypher_match_subset`); the
    // FULL openCypher grammar stays out — patterns are programmatic per the
    // north rule, and CypherLite rejects anything beyond its fragment
    "cypher_full_grammar",
    "multimodal_decode_jpeg", // stubbed: no codec in this container
    "multimodal_decode_webp")
}
