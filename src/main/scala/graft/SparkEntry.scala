package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraphEtl, Pipeline, Relational}

/** Driver contract — see SURVEY.md §2 for the operator inventory. Each
  * implemented operator has an entry in [[queries]]; those with an ANSI-SQL
  * twin also appear in [[oracleSql]] (DuckDB-verified at sf0.01).
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the reference's full pipeline (map three
    * tables to a knowledge graph, aggregate to PG elements, summarise);
    * driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    GraphEtl.kgEndToEnd(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A: graph-ETL surface
    "tabmap_nodes"  -> (GraphEtl.tabmapNodes(_, _)),
    "tabmap_edges"  -> (GraphEtl.tabmapEdges(_, _)),
    "tabmap_chain"  -> (GraphEtl.tabmapChain(_, _)),
    "tabmap_prefix" -> (GraphEtl.tabmapPrefix(_, _)),
    "pg_nodes"      -> (GraphEtl.pgNodes(_, _)),
    "pg_edges"      -> (GraphEtl.pgEdges(_, _)),
    "pg_jsonl"      -> (GraphEtl.pgJsonl(_, _)),
    "union_by_name" -> (GraphEtl.unionByName(_, _)),
    "cast_columns"  -> (GraphEtl.castColumns(_, _)),
    "neo_cypher"    -> (GraphEtl.neoCypher(_, _)),
    "kg_e2e"        -> (GraphEtl.kgEndToEnd(_, _)),
    "kg_two_hop"    -> (GraphEtl.kgTwoHop(_, _)),
    "kg_pagerank"   -> (GraphEtl.kgPageRank(_, _)),
    // B: relational core
    "q1_agg"        -> (Relational.q1Agg(_, _)),
    "q3_join_agg"   -> (Relational.q3JoinAgg(_, _)),
    "q5_multijoin"  -> (Relational.q5MultiJoin(_, _)),
    "q_topk"        -> (Relational.qTopK(_, _)),
    "q_window"      -> (Relational.qWindow(_, _)),
    "q_rollup"      -> (Relational.qRollup(_, _)),
    "q_distinct"    -> (Relational.qDistinct(_, _)),
    "q_semijoin"    -> (Relational.qSemiJoin(_, _)),
    "q_antijoin"    -> (Relational.qAntiJoin(_, _)),
    "events_window" -> (Relational.eventsWindow(_, _)),
    "sessionize_events" -> (Relational.sessionizeEvents(_, _)),
    "q6_sql"        -> (Relational.q6Sql(_, _)),
    "q_cube"        -> (Relational.qCube(_, _)),
    "q_median"      -> (Relational.qMedian(_, _)),
    "q_pivot"       -> (Relational.qPivot(_, _)),
    "q_regex"       -> (Relational.qRegex(_, _)),
    "q_datetime"    -> (Relational.qDatetime(_, _)),
    // C: LLM-training-data pipeline
    "dedup_exact"         -> (Pipeline.dedupExact(_, _)),
    "dedup_ngram_jaccard" -> (Pipeline.dedupNgramJaccard(_, _)),
    "dedup_minhash"       -> (Pipeline.dedupMinhash(_, _)),
    "dedup_clusters"      -> (Pipeline.dedupClusters(_, _)),
    "pg_degrees"          -> (GraphEtl.pgDegrees(_, _)),
    "dedup_simhash"       -> (Pipeline.dedupSimhash(_, _)),
    "dedup_embedding"     -> (Pipeline.dedupEmbedding(_, _)),
    "ann_topk"            -> (Pipeline.annTopK(_, _)),
    "ann_lsh"             -> (Pipeline.annLsh(_, _)),
    "ann_ivf"             -> (Pipeline.annIvf(_, _)),
    "text_lang_id"        -> (Pipeline.textLangId(_, _)),
    "text_lang_trigram"   -> (Pipeline.textLangTrigram(_, _)),
    "text_profile_train"  -> (Pipeline.textProfileTrain(_, _)),
    "text_trigram_train"  -> (Pipeline.textTrigramTrain(_, _)),
    "text_quality"        -> (Pipeline.textQuality(_, _)),
    "token_count"         -> (Pipeline.tokenCount(_, _)),
    "text_surprisal"      -> (Pipeline.textSurprisal(_, _)),
    "pack_sequences"      -> (Pipeline.packSequences(_, _)),
    "split_assign"        -> (Pipeline.splitAssign(_, _)),
    "pipeline_e2e"        -> (Pipeline.pipelineE2e(_, _)),
    "doc_chunk"           -> (Pipeline.docChunk(_, _)),
    "contamination"       -> (Pipeline.contamination(_, _)),
    "doc_fingerprint"     -> (Pipeline.docFingerprint(_, _)),
    "multimodal_meta"     -> (Pipeline.multimodalMeta(_, _)),
    "source_similarity"   -> (Pipeline.sourceSimilarity(_, _)),
    "pipeline_filter"     -> (Pipeline.pipelineFilter(_, _)),
    "q_setops"            -> (Relational.qSetOps(_, _)),
    "q_scalar_subq"       -> (Relational.qScalarSubq(_, _)),
    "q_asof"              -> (Relational.qAsOf(_, _)),
    "q_range_join"        -> (Relational.qRangeJoin(_, _)),
    "q_scalar_funcs"      -> (Relational.qScalarFuncs(_, _)),
    "q_json_extract"      -> (Relational.qJsonExtract(_, _)),
    "q_bucketed_join"     -> (Relational.qBucketedJoin(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "tabmap_nodes"  -> GraphEtl.tabmapNodesSql,
    "tabmap_edges"  -> GraphEtl.tabmapEdgesSql,
    "tabmap_chain"  -> GraphEtl.tabmapChainSql,
    "tabmap_prefix" -> GraphEtl.tabmapPrefixSql,
    "pg_nodes"      -> GraphEtl.pgNodesSql,
    "pg_edges"      -> GraphEtl.pgEdgesSql,
    "pg_jsonl"      -> GraphEtl.pgJsonlSql,
    "neo_cypher"    -> GraphEtl.neoCypherSql,
    "union_by_name" -> GraphEtl.unionByNameSql,
    "cast_columns"  -> GraphEtl.castColumnsSql,
    "kg_e2e"        -> GraphEtl.kgEndToEndSql,
    "kg_two_hop"    -> GraphEtl.kgTwoHopSql,
    "kg_pagerank"   -> GraphEtl.kgPageRankSql,
    "q1_agg"        -> Relational.q1AggSql,
    "q3_join_agg"   -> Relational.q3JoinAggSql,
    "q5_multijoin"  -> Relational.q5MultiJoinSql,
    "q_topk"        -> Relational.qTopKSql,
    "q_window"      -> Relational.qWindowSql,
    "q_rollup"      -> Relational.qRollupSql,
    "q_distinct"    -> Relational.qDistinctSql,
    "q_semijoin"    -> Relational.qSemiJoinSql,
    "q_antijoin"    -> Relational.qAntiJoinSql,
    "events_window" -> Relational.eventsWindowSql,
    "sessionize_events" -> Relational.sessionizeEventsSql,
    "q6_sql"        -> Relational.q6SqlSql,
    "q_cube"        -> Relational.qCubeSql,
    "q_median"      -> Relational.qMedianSql,
    "q_pivot"       -> Relational.qPivotSql,
    "q_regex"       -> Relational.qRegexSql,
    "q_datetime"    -> Relational.qDatetimeSql,
    "dedup_exact"         -> Pipeline.dedupExactSql,
    "dedup_ngram_jaccard" -> Pipeline.dedupNgramJaccardSql,
    "dedup_minhash"       -> Pipeline.dedupMinhashSql,
    "dedup_clusters"      -> Pipeline.dedupClustersSql,
    "pg_degrees"          -> GraphEtl.pgDegreesSql,
    "dedup_embedding"     -> Pipeline.dedupEmbeddingSql,
    "ann_topk"            -> Pipeline.annTopKSql,
    "ann_lsh"             -> Pipeline.annLshSql,
    "dedup_simhash"       -> Pipeline.dedupSimhashSql,
    "text_lang_id"        -> Pipeline.textLangIdSql,
    "text_lang_trigram"   -> Pipeline.textLangTrigramSql,
    "text_profile_train"  -> Pipeline.textProfileTrainSql,
    "text_trigram_train"  -> Pipeline.textTrigramTrainSql,
    "text_quality"        -> Pipeline.textQualitySql,
    "token_count"         -> Pipeline.tokenCountSql,
    "text_surprisal"      -> Pipeline.textSurprisalSql,
    "pack_sequences"      -> Pipeline.packSequencesSql,
    "split_assign"        -> Pipeline.splitAssignSql,
    "pipeline_e2e"        -> Pipeline.pipelineE2eSql,
    "doc_chunk"           -> Pipeline.docChunkSql,
    "contamination"       -> Pipeline.contaminationSql,
    "doc_fingerprint"     -> Pipeline.docFingerprintSql,
    "multimodal_meta"     -> Pipeline.multimodalMetaSql,
    "pipeline_filter"     -> Pipeline.pipelineFilterSql,
    "q_setops"            -> Relational.qSetOpsSql,
    "q_scalar_subq"       -> Relational.qScalarSubqSql,
    "q_asof"              -> Relational.qAsOfSql,
    "q_range_join"        -> Relational.qRangeJoinSql,
    "q_scalar_funcs"      -> Relational.qScalarFuncsSql,
    "q_json_extract"      -> Relational.qJsonExtractSql,
    "q_bucketed_join"     -> Relational.qBucketedJoinSql
  )
}
