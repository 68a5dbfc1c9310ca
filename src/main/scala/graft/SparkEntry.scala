package graft
import graft.engine.{DataQueries => DQ, EntryQueries => EQ, GenericQueries => GQ}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query + (where ANSI-SQL
  * expressible) a DuckDB oracle; spatial queries run over
  * deterministic synthesized fixtures, generic operators over the
  * driver's parquet tables in `sfDir`.
  */
object SparkEntry {
  /** Flagship: full zonal-statistics pipeline (decode → spatial join
    * → rollup) over the synthesized world tile table. */
  def entry(spark: SparkSession): DataFrame =
    EQ.zonalBasic(spark)

  /** Raw query registry — wrapped by [[queries]] with a cache drain
    * so a harness looping over queries in one session releases the
    * previous query's registered caches (graft.engine.Caches) before
    * the next one runs.
    *
    * CONTRACT: construct a query's frame and materialize it BEFORE
    * constructing the next one (the driver's harness and graft.Verify
    * both do). A caller that constructs several frames up front will
    * see earlier frames' persists drained at the next construction —
    * results stay correct (deterministic recompute), only the caching
    * is lost. Such callers should use the un-wrapped operators and
    * call Caches.drain(spark) themselves after consuming each result
    * (the pattern graft.Bench's query loop models). */
  private def rawQueries: Map[String, (SparkSession, String) => DataFrame]
    = Map(
    // zonal-statistics engine (reference core)
    "q_zonal_basic" -> ((s, _) => EQ.zonalBasic(s)),
    "q_zonal_percentile" -> ((s, _) => EQ.zonalPercentile(s)),
    "q_zonal_fallback" -> ((s, _) => EQ.zonalFallback(s)),
    "q_zonal_lastwins" -> ((s, _) => EQ.zonalLastWins(s)),
    "q_zonal_checkpointed" -> ((s, _) => EQ.zonalCheckpointed(s)),
    "q_zonal_incremental" -> ((s, _) => EQ.zonalIncremental(s)),
    "q_zonal_after_delete" -> ((s, _) => EQ.zonalAfterDelete(s)),
    "q_schema_evolution" -> ((s, _) => EQ.schemaEvolution(s)),
    "q_zonal_reprojected" -> ((s, _) => EQ.zonalReprojected(s)),
    "q_zonal_band2" -> ((s, _) => EQ.zonalBand2(s)),
    "q_zonal_ties" -> ((s, _) => EQ.zonalTies(s)),
    "q_zonal_table" -> ((s, _) => EQ.zonalTable(s)),
    // spatial extras (north-star ops)
    "q_overlap_area" -> ((s, _) => EQ.overlapArea(s)),
    "q_knn_zones" -> ((s, sf) => EQ.knnZones(s, sf)),
    "q_tile_stats" -> ((s, _) => EQ.tileStats(s)),
    "q_image_resize" -> ((s, _) => EQ.imageResize(s)),
    "q_jpeg_psnr" -> ((s, _) => EQ.jpegPsnr(s)),
    "q_image_dhash" -> ((s, _) => EQ.imageDhash(s)),
    "q_image_neardup" -> ((s, _) => EQ.imageNearDup(s)),
    "q_image_incr" -> ((s, _) => EQ.imageIncr(s)),
    "q_image_clusters" -> ((s, _) => EQ.imageClusters(s)),
    // generic relational operators
    "q_agg_pricing" -> ((s, sf) => GQ.aggPricing(s, sf)),
    "q_join_nation_rev" -> ((s, sf) => GQ.joinNationRevenue(s, sf)),
    "q_anti_join" -> ((s, sf) => GQ.antiCustomersNoOrders(s, sf)),
    "q_semi_join" -> ((s, sf) => GQ.semiCustomersWithOrders(s, sf)),
    "q_distinct_union" -> ((s, sf) => GQ.distinctUnion(s, sf)),
    "q_sort_nulllast" -> ((s, _) => GQ.sortNullLast(s)),
    "q_pivot_events" -> ((s, sf) => GQ.pivotEvents(s, sf)),
    "q_hourly_events" -> ((s, sf) => GQ.hourlyEvents(s, sf)),
    "q_percentile_quantity" -> ((s, sf) => GQ.percentileQuantity(s, sf)),
    "q_isclose_discount" -> ((s, sf) => GQ.iscloseDiscount(s, sf)),
    "q_cell_points" -> ((s, sf) => GQ.cellPoints(s, sf)),
    "q_asof_clicks" -> ((s, sf) => GQ.asofClicks(s, sf)),
    "q_range_bands" -> ((s, sf) => GQ.rangeBands(s, sf)),
    "q_salted_agg" -> ((s, sf) => GQ.saltedAgg(s, sf)),
    "q_sessionize" -> ((s, sf) => GQ.sessionize(s, sf)),
    "q_rollup_pricing" -> ((s, sf) => GQ.rollupPricing(s, sf)),
    "q_approx_distinct" -> ((s, sf) => GQ.approxDistinct(s, sf)),
    "q_ivf_topk" -> ((s, sf) => DQ.ivfTopK(s, sf)),
    "q_ivf_incr" -> ((s, sf) => DQ.ivfIncr(s, sf)),
    "q_ivf_trained" -> ((s, sf) => DQ.ivfTrained(s, sf)),
    "q_ivf_k256" -> ((s, sf) => DQ.ivfK256(s, sf)),
    // training-data pipeline operators
    "q_dedup_exact" -> ((s, sf) => DQ.dedupExact(s, sf)),
    "q_hash_split" -> ((s, sf) => DQ.hashSplit(s, sf)),
    "q_hash_sample" -> ((s, sf) => DQ.hashSample(s, sf)),
    "q_ngram_jaccard" -> ((s, sf) => DQ.ngramJaccard(s, sf)),
    "q_minhash_lsh" -> ((s, sf) => DQ.minhashLsh(s, sf)),
    "q_minhash_incr" -> ((s, sf) => DQ.minhashIncr(s, sf)),
    "q_minhash_takedown" -> ((s, sf) => DQ.minhashTakedown(s, sf)),
    "q_srp_takedown" -> ((s, sf) => DQ.srpTakedown(s, sf)),
    "q_image_takedown" -> ((s, _) => EQ.imageTakedown(s)),
    "q_minhash_clusters" -> ((s, sf) => DQ.minhashClusters(s, sf)),
    "q_sig_groups" -> ((s, sf) => DQ.sigGroups(s, sf)),
    "q_stream_sigdedup" -> ((s, sf) => DQ.streamSigDedup(s, sf)),
    "q_winnow_fps" -> ((s, sf) => DQ.winnowFps(s, sf)),
    "q_winnow_rolling" -> ((s, sf) => DQ.winnowRolling(s, sf)),
    "q_winnow_rolling_pairs" -> ((s, sf) => DQ.winnowRollingPairs(s, sf)),
    "q_winnow_pairs" -> ((s, sf) => DQ.winnowPairs(s, sf)),
    "q_dedup_components" -> ((s, sf) => DQ.dedupComponents(s, sf)),
    "q_simhash" -> ((s, sf) => DQ.simhash16(s, sf)),
    "q_token_stats" -> ((s, sf) => DQ.tokenStats(s, sf)),
    "q_token_bpe" -> ((s, sf) => DQ.tokenBpe(s, sf)),
    "q_quality_scores" -> ((s, sf) => DQ.qualityScores(s, sf)),
    "q_dup_lines" -> ((s, sf) => DQ.dupLines(s, sf)),
    "q_top_ngrams" -> ((s, sf) => DQ.topNgrams(s, sf)),
    "q_pii_redact" -> ((s, sf) => DQ.piiRedact(s, sf)),
    "q_url_domains" -> ((s, sf) => DQ.urlDomains(s, sf)),
    "q_lang_id" -> ((s, sf) => DQ.langId(s, sf)),
    "q_embed_topk" -> ((s, sf) => DQ.embedTopK(s, sf)),
    "q_embed_neardup" -> ((s, sf) => DQ.embedNearDup(s, sf)),
    "q_embed_clusters" -> ((s, sf) => DQ.embedClusters(s, sf)),
    // scale-path / multimodal ops (rows-only where not SQL-expressible)
    "q_zonal_approx_pct" -> ((s, _) => EQ.zonalApproxPercentile(s)),
    "q_zonal_gk_pct" -> ((s, _) => EQ.zonalGkPercentile(s)),
    "q_srp_neardup" -> ((s, sf) => DQ.srpNearDup(s, sf)),
    "q_srp_incr" -> ((s, sf) => DQ.srpIncr(s, sf)),
    "q_srp_multiprobe" -> ((s, sf) => DQ.srpMultiProbe(s, sf)),
    "q_srp_banded" -> ((s, sf) => DQ.srpBanded(s, sf)),
    "q_srp_hidim" -> ((s, sf) => DQ.srpHiDim(s, sf)),
    "q_audio_framesample" -> ((s, sf) => DQ.audioFrameSample(s, sf)),
    "q_audio_adpcm" -> ((s, sf) => DQ.audioAdpcm(s, sf)),
    "q_video_frames" -> ((s, sf) => DQ.videoFrames(s, sf)),
    "q_video_delta" -> ((s, sf) => DQ.videoDelta(s, sf)),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> ((s: SparkSession, sf: String) => {
        graft.engine.Caches.drain(s) // previous query is materialized
        fn(s, sf)
      })
    }

  def oracleSql: Map[String, String] = Map(
    "q_zonal_basic" -> EQ.zonalBasicSql,
    "q_zonal_percentile" -> EQ.zonalPercentileSql,
    "q_zonal_fallback" -> EQ.zonalFallbackSql,
    "q_zonal_lastwins" -> EQ.zonalLastWinsSql,
    "q_zonal_checkpointed" -> EQ.zonalCheckpointedSql,
    "q_zonal_incremental" -> EQ.zonalIncrementalSql,
    "q_zonal_after_delete" -> EQ.zonalAfterDeleteSql,
    "q_schema_evolution" -> EQ.schemaEvolutionSql,
    "q_zonal_reprojected" -> EQ.zonalReprojectedSql,
    "q_zonal_band2" -> EQ.zonalBand2Sql,
    "q_zonal_ties" -> EQ.zonalTiesSql,
    "q_zonal_table" -> EQ.zonalTableSql,
    "q_overlap_area" -> EQ.overlapAreaSql,
    "q_knn_zones" -> EQ.knnZonesSql,
    "q_tile_stats" -> EQ.tileStatsSql,
    "q_image_resize" -> EQ.imageResizeSql,
    "q_jpeg_psnr" -> EQ.jpegPsnrSql,
    "q_image_dhash" -> EQ.imageDhashSql,
    "q_image_neardup" -> EQ.imageNearDupSql,
    "q_image_incr" -> EQ.imageIncrSql,
    "q_image_clusters" -> EQ.imageClustersSql,
    "q_agg_pricing" -> GQ.aggPricingSql,
    "q_join_nation_rev" -> GQ.joinNationRevenueSql,
    "q_anti_join" -> GQ.antiCustomersNoOrdersSql,
    "q_semi_join" -> GQ.semiCustomersWithOrdersSql,
    "q_distinct_union" -> GQ.distinctUnionSql,
    "q_sort_nulllast" -> GQ.sortNullLastSql,
    "q_pivot_events" -> GQ.pivotEventsSql,
    "q_hourly_events" -> GQ.hourlyEventsSql,
    "q_percentile_quantity" -> GQ.percentileQuantitySql,
    "q_isclose_discount" -> GQ.iscloseDiscountSql,
    "q_cell_points" -> GQ.cellPointsSql,
    "q_asof_clicks" -> GQ.asofClicksSql,
    "q_range_bands" -> GQ.rangeBandsSql,
    "q_salted_agg" -> GQ.saltedAggSql,
    "q_sessionize" -> GQ.sessionizeSql,
    "q_rollup_pricing" -> GQ.rollupPricingSql,
    "q_approx_distinct" -> GQ.approxDistinctSql,
    "q_ivf_topk" -> DQ.ivfTopKSql,
    "q_ivf_incr" -> DQ.ivfIncrSql,
    "q_ivf_trained" -> DQ.ivfTrainedSql,
    "q_ivf_k256" -> DQ.ivfK256Sql,
    "q_dedup_exact" -> DQ.dedupExactSql,
    "q_hash_split" -> DQ.hashSplitSql,
    "q_hash_sample" -> DQ.hashSampleSql,
    "q_ngram_jaccard" -> DQ.ngramJaccardSql,
    "q_minhash_lsh" -> DQ.minhashLshSql,
    "q_minhash_incr" -> DQ.minhashIncrSql,
    "q_minhash_takedown" -> DQ.minhashTakedownSql,
    "q_srp_takedown" -> DQ.srpTakedownSql,
    "q_image_takedown" -> EQ.imageTakedownSql,
    "q_minhash_clusters" -> DQ.minhashClustersSql,
    "q_sig_groups" -> DQ.sigGroupsSql,
    "q_stream_sigdedup" -> DQ.streamSigDedupSql,
    "q_winnow_fps" -> DQ.winnowFpsSql,
    "q_winnow_rolling" -> DQ.winnowRollingSql,
    "q_winnow_rolling_pairs" -> DQ.winnowRollingPairsSql,
    "q_winnow_pairs" -> DQ.winnowPairsSql,
    "q_dedup_components" -> DQ.dedupComponentsSql,
    "q_simhash" -> DQ.simhash16Sql,
    "q_token_stats" -> DQ.tokenStatsSql,
    "q_token_bpe" -> DQ.tokenBpeSql,
    "q_quality_scores" -> DQ.qualityScoresSql,
    "q_dup_lines" -> DQ.dupLinesSql,
    "q_top_ngrams" -> DQ.topNgramsSql,
    "q_pii_redact" -> DQ.piiRedactSql,
    "q_url_domains" -> DQ.urlDomainsSql,
    "q_lang_id" -> DQ.langIdSql,
    "q_embed_topk" -> DQ.embedTopKSql,
    "q_embed_neardup" -> DQ.embedNearDupSql,
    "q_embed_clusters" -> DQ.embedClustersSql,
    "q_audio_framesample" -> DQ.audioFrameSampleSql,
    "q_audio_adpcm" -> DQ.audioAdpcmSql,
    "q_zonal_approx_pct" -> EQ.zonalApproxPercentileSql,
    "q_zonal_gk_pct" -> EQ.zonalGkPercentileSql,
    "q_srp_neardup" -> DQ.srpNearDupSql,
    "q_srp_incr" -> DQ.srpIncrSql,
    "q_srp_multiprobe" -> DQ.srpMultiProbeSql,
    "q_srp_banded" -> DQ.srpBandedSql,
    "q_srp_hidim" -> DQ.srpHiDimSql,
    "q_video_frames" -> DQ.videoFramesSql,
    "q_video_delta" -> DQ.videoDeltaSql,
  )
}
