package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.GraftSession
import graft.ops.{Analytics, JsonQueries, PipelineQueries, Stats}

/** Regenerates PLANS.md: formatted physical plans for the
  * scale-critical queries, with the lines that prove the shape
  * (pushdown, broadcast, TakeOrdered, partial aggregation) kept intact.
  * Run: `sbt "runMain graft.tools.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = "/root/testdata/sf0.01"
    val targets = Seq(
      "q1_pricing (filter pushdown + partial agg)" ->
        Analytics.q1Pricing(spark, d),
      "q3_shipping (broadcast dims + TakeOrderedAndProject)" ->
        Analytics.q3Shipping(spark, d),
      "q6_forecast (all filters at the scan)" ->
        Analytics.q6Forecast(spark, d),
      "q_topk_global (no global sort)" ->
        Analytics.qTopKGlobal(spark, d),
      "q_topk_per_key (bounded-heap aggregate, map-side combine)" ->
        Analytics.qTopKPerKey(spark, d),
      "q_window_topn (auto-rewritten by RewriteWindowTopK)" ->
        Analytics.qWindowTopN(spark, d),
      "point_lookup (EqualTo pushed to parquet)" ->
        JsonQueries.pointLookup(spark, d),
      "upsert (broadcast anti-join, base never shuffles)" ->
        JsonQueries.upsert(spark, d),
      "q_range_join (broadcast nested loop on the band dim)" ->
        Analytics.qRangeJoin(spark, d),
      "ann_brute_topk (query set broadcast, corpus never shuffles)" ->
        PipelineQueries.annBruteTopK(spark, d),
      "q_sample_stratified (hash filter at the scan, zero shuffles)" ->
        PipelineQueries.sampleStratified(spark, d),
      "text_contamination (benchmark set broadcast, corpus never shuffles)" ->
        PipelineQueries.textContamination(spark, d),
      "q_corr_subquery (correlated subqueries decorrelated to joins)" ->
        Analytics.qCorrSubquery(spark, d),
      "q_skew_join_salted (salt-replicated small side broadcasts)" ->
        Analytics.qSkewJoinSalted(spark, d),
      "q_date_spine (one-row bounds → exploded spine, broadcast left join)" ->
        Analytics.qDateSpine(spark, d),
      "dedup_incremental (batch band-index probe, corpus never pairs itself)" ->
        PipelineQueries.dedupIncremental(spark, d),
      "q_cdc_apply (changelog broadcasts, base never shuffles)" ->
        graft.ops.Warehouse.qCdcApply(spark, d),
      "ann_pq_topk (codes + broadcast queries; shortlist re-rank equi-join)" ->
        PipelineQueries.annPqTopK(spark, d),
      "q_count_min_topk (fixed-size sketch, map-side partial merge)" ->
        PipelineQueries.countMinTopK(spark, d),
      "q_sample_weighted (native WindowGroupLimit pre-shuffle bound)" ->
        PipelineQueries.sampleWeighted(spark, d),
      "q_bloom_semi_filter (sketch folded into the fact scan, then exact join)" ->
        graft.ops.Warehouse.qBloomSemiFilter(spark, d),
      "q_triangle_count (broadcast adjacency intersect — wedges never shuffle)" ->
        Analytics.qTriangleCount(spark, d),
      "q_anomaly_zscore (stats broadcast back, fact never shuffles)" ->
        graft.ops.Behavior.qAnomalyZscore(spark, d),
      "q_attribution (one window pass, no self-join)" ->
        graft.ops.Behavior.qAttribution(spark, d),
      "q_anomaly_mad (median/MAD broadcast fences, fact never shuffles)" ->
        graft.ops.Mining.qAnomalyMad(spark, d),
      "q_item_cosine (broadcast item frequencies + TakeOrderedAndProject)" ->
        graft.ops.Mining.qItemCosine(spark, d),
      "q_markov_chain (one lead-window shuffle, tiny matrix aggregate)" ->
        graft.ops.Mining.qMarkovChain(spark, d),
      "q_skyline (ranged running max — no global sort, no O(n²) dominance join)" ->
        graft.ops.Mining.qSkyline(spark, d),
      "dedup_passage (one md5-64-keyed shuffle, window first-occurrence)" ->
        PipelineQueries.dedupPassage(spark, d),
      "q_decay_score (decay fused into ONE partial agg, anchor broadcast)" ->
        graft.ops.Behavior.qDecayScore(spark, d),
      "ann_filtered_topk (predicate rides the broadcast join — pre-filter)" ->
        PipelineQueries.annFilteredTopK(spark, d),
      "q_rfm (range-partitioned ntile — no single-task sort of the customer frame)" ->
        graft.ops.Mining.qRfm(spark, d),
      "q_event_pattern (one user-keyed window pass, no self-joins)" ->
        graft.ops.Behavior.qEventPattern(spark, d),
      "dedup_embed_cosine (one 16-plane code pass; only (a,b,cos) survivors shuffle)" ->
        PipelineQueries.dedupEmbedCosine(spark, d),
      "q_abc_class (ranged parallel cent cumsum — exact, no global sort)" ->
        graft.ops.Mining.qAbcClass(spark, d),
      "q_inventory_balance (capped cumsum in closed form — one per-part window pass)" ->
        graft.ops.Mining.qInventoryBalance(spark, d),
      "data_pack_sequences (ranged parallel token cumsum; integer-div pack bounds)" ->
        PipelineQueries.dataPackSequences(spark, d),
      "q_sssp_weighted (broadcast-frontier relaxation vs checkpointed edges)" ->
        graft.ops.Mining.qSsspWeighted(spark, d),
      "q_ks_test (ranged dual CDF cumsum — no single-task distinct-value sort)" ->
        graft.ops.Mining.qKsTest(spark, d),
      "q_power_users_pareto (rank + cumsum share ONE ranged scan)" ->
        graft.ops.Mining.qPowerUsersPareto(spark, d),
      "q_sample_systematic (integer weight cumsum; 20-row position broadcast)" ->
        PipelineQueries.sampleSystematic(spark, d),
      "text_bm25_rank (one-broadcast-row model, map-only scoring, TakeOrdered)" ->
        PipelineQueries.textBm25Rank(spark, d),
      "q_interval_align (map-only month explode, one rollup shuffle)" ->
        Analytics.qIntervalAlign(spark, d),
      "data_interleave_mixture (ranged global slot rank over exact vtime)" ->
        PipelineQueries.dataInterleaveMixture(spark, d),
      "ann_ivfpq_filtered (predicate prunes candidates before the ADC scan)" ->
        PipelineQueries.annIvfPqFiltered(spark, d),
      "q_sample_weighted_reservoir (global top-k = TakeOrderedAndProject, no sort)" ->
        PipelineQueries.sampleWeightedReservoir(spark, d),
      "dedup_span_excise (8-byte window hashes shuffle; per-doc bounded island merge)" ->
        PipelineQueries.dedupSpanExcise(spark, d),
      "text_hybrid_rrf (two TakeOrdered k-row lists; k-row fusion join)" ->
        PipelineQueries.textHybridRrf(spark, d),
      "ann_sq8_topk (one codegen'd encode pass; ADC + bounded shortlist re-rank)" ->
        PipelineQueries.annSq8TopK(spark, d),
      "data_importance_resample (256-row model broadcast; doc-keyed partial agg; TakeOrdered)" ->
        PipelineQueries.dataImportanceResample(spark, d),
      "q_modularity (shared LPA fold; integer-numerator terms; tiny community rollups)" ->
        graft.ops.Mining.qModularity(spark, d),
      "ann_mmr_rerank (broadcast-query shortlist scan; constant-k greedy fold)" ->
        PipelineQueries.annMmrRerank(spark, d),
      "q_bitmap_overlap (bit_or block rollup; block-keyed AND+popcount join)" ->
        graft.ops.Warehouse.qBitmapOverlap(spark, d),
      "text_keyword_rake (doc-partitioned segmentation; token/phrase-keyed partial aggs)" ->
        PipelineQueries.textKeywordRake(spark, d),
      "q_mutual_best_match (blocked pairs; name-keyed argmin; best-table self-join)" ->
        graft.ops.Warehouse.qMutualBestMatch(spark, d),
      "dedup_setsim_join (prefix explode halves the index; rare-shingle equi-join)" ->
        PipelineQueries.dedupSetsimJoin(spark, d),
      "q_shapley_attribution (one bitmask pass; constant subset-lattice algebra)" ->
        graft.ops.Behavior.qShapleyAttribution(spark, d),
      "q_holt_winters (one shuffle to daily grain; fold on the tiny series frame)" ->
        graft.ops.Behavior.qHoltWinters(spark, d),
      "q_kll_quantile_merge (partial-aggregable sketches; 1-row estimate broadcast)" ->
        PipelineQueries.kllQuantileMerge(spark, d),
      "dedup_minhash_lsh (single-eval BandKeys kernel in the Generate; band-bucket self-join is the only corpus shuffle)" ->
        PipelineQueries.dedupMinhashLsh(spark, d),
      "q_theta_setops (partial-aggregable theta sketches; set ops on the 5-row sketch table)" ->
        PipelineQueries.thetaSetOps(spark, d),
      "q_ohlc_bars (open/close as partial-aggregable min_by/max_by — no per-bar window)" ->
        graft.ops.Behavior.qOhlcBars(spark, d),
      "q_asof_nearest (backward+forward fills share ONE sort; distance pick is a map)" ->
        Analytics.qAsofNearest(spark, d),
      "q_fifo_allocation (per-part cumsum windows; interval-intersection equi+overlap join)" ->
        graft.ops.Warehouse.qFifoAllocation(spark, d),
      "q_interval_overlap_join (sweep-line windows per part; C(n,2)−disjoint, no pair join)" ->
        graft.ops.Profiling.qIntervalOverlapJoin(spark, d),
      "q_skew_audit (per-key count frames; all stats on the |keys|-sized rollups)" ->
        graft.ops.Profiling.qSkewAudit(spark, d),
      "q_bitemporal_asof (version union + max_by argmax — no window, no self-join)" ->
        graft.ops.Warehouse.qBitemporalAsof(spark, d),
      "data_group_kfold (map-side hash fold assignment; two keyed rollups)" ->
        PipelineQueries.dataGroupKfold(spark, d),
      "text_bigram_ppl (bigram-keyed model join; unseen fall through the left join)" ->
        PipelineQueries.textBigramPpl(spark, d),
      "embed_outlier_maha (64-row moment broadcast; vector-keyed partial agg; TakeOrdered)" ->
        PipelineQueries.embedOutlierMaha(spark, d),
      "dedup_substring_spans (8-byte window hashes shuffle, text never does; AQE picks the dup-set join)" ->
        PipelineQueries.dedupSubstringSpans(spark, d),
      "embed_knn_graph (bucket-bounded pair gen; native WindowGroupLimit pre-shuffle top-3 bound)" ->
        PipelineQueries.embedKnnGraph(spark, d),
      "q_edit_distance_join (O(n·L) del1 keys; bucket equi-join; lev verify — no cross product)" ->
        graft.ops.Warehouse.qEditDistanceJoin(spark, d),
      "q_grid_distance_join (cell-keyed equi-join after 9-offset explode; integer verify)" ->
        graft.ops.Warehouse.qGridDistanceJoin(spark, d),
      "q_graph_cluster_coeff (one Generate pass credits all 3 corners; no materialized intersections)" ->
        graft.ops.Mining.qGraphClusterCoeff(spark, d),
      "text_ngram_novelty (8-byte shingle hashes shuffle; partial-aggregable first-occurrence min)" ->
        PipelineQueries.textNgramNovelty(spark, d),
      "q_kendall_tau (two-level value-bucket dominance count — residual joins bucket-bounded, no group-quadratic pair join)" ->
        graft.ops.Mining.qKendallTau(spark, d),
      "q_gini (per-nation rank via ranged groupRowNumber — no Window.partitionBy(nation) sort)" ->
        graft.ops.Mining.qGini(spark, d),
      "q_betweenness_approx (frontier-sized BFS shuffles + backward level joins — never the whole graph)" ->
        graft.ops.Mining.qBetweennessApprox(spark, d),
      "embed_hard_negatives (label filter rides the broadcast join — drops before scoring)" ->
        PipelineQueries.embedHardNegatives(spark, d),
      "text_oov_rate (token md5-64 hashes shuffle; one distinct rollup + membership join)" ->
        PipelineQueries.textOovRate(spark, d),
      "q_ktruss (support via distributed two-path join — no adjacency broadcast/collect)" ->
        graft.ops.Mining.qKtruss(spark, d),
      "q_personalized_pagerank (integer-lattice rounds; shuffles keyed on node id; no doubles)" ->
        graft.ops.Mining.qPersonalizedPagerank(spark, d),
      "q_itemset3 (candidate semi-joins bound the triple enumeration by the frequent-pair relation)" ->
        graft.ops.Mining.qItemset3(spark, d),
      "q_roc_auc (one groupBy(score) histogram; CDFs on the ranged scan — no per-row rank)" ->
        graft.ops.MlEval.qRocAuc(spark, d),
      "text_cooc_pmi (pair relation from unique-key equi-joins on (doc, pos+k); unigrams joined after the top-30 cut)" ->
        PipelineQueries.textCoocPmi(spark, d),
      "q_timezone_funcs (map-only zone projection + one grouped census per zone)" ->
        Analytics.qTimezoneFuncs(spark, d),
      "dedup_unicode (map-only variant fan-out; the one shuffle carries 8-byte canon hashes)" ->
        PipelineQueries.dedupUnicode(spark, d),
      "q_vwap (one partial-aggregable daily rollup; exact integer folds)" ->
        graft.ops.Series.qVwap(spark, d),
      "q_mantel_haenszel (day-strata cells via ONE partial agg; pooled OR on the tiny strata frame)" ->
        Stats.qMantelHaenszel(spark, d),
      "q_capture_recapture (1-row midpoint broadcast; per-user census is the only corpus shuffle)" ->
        Stats.qCaptureRecapture(spark, d),
      "dedup_short_spans (fine 20/4 grid: 8-byte hashes shuffle, text never does; AQE dup-set join)" ->
        PipelineQueries.dedupShortSpans(spark, d),
      "embed_participation_ratio (one generator pass to 2080 covariance cells — no self-join)" ->
        PipelineQueries.embedParticipationRatio(spark, d),
      "text_burrows_delta (one token census; z/delta on the 20x20 source-word grid)" ->
        PipelineQueries.textBurrowsDelta(spark, d),
      "q_ulcer_index (calendar-bounded daily frame; running-peak window; 1-row fold)" ->
        graft.ops.Behavior.qUlcerIndex(spark, d),
      "q_moods_median (ranged global median selection — no single-task sort; k-cell chi2)" ->
        Stats.qMoodsMedian(spark, d),
      "q_anderson_darling (ranged order statistics; micro-lattice term fold)" ->
        Stats.qAndersonDarling(spark, d),
      "source_avro_roundtrip (map-only per-partition encode/decode seams; census rollup)" ->
        graft.sources.Formats.avroRoundtrip(spark, d))
    val out = new StringBuilder
    out.append("# PLANS — physical-plan audit (generated by " +
      "graft.tools.PlanAudit)\n\n")
    out.append("Regenerate after plan-affecting changes: " +
      "`sbt \"runMain graft.tools.PlanAudit\"`.\n")
    targets.foreach { case (title, df) =>
      out.append(s"\n## $title\n\n```\n")
      val full = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // keep the tree plus the scan/join detail lines that matter
      val keep = full.linesIterator.filter { l =>
        l.startsWith("*") || l.startsWith("+") || l.startsWith(" ") &&
          (l.contains("Scan") || l.contains("Join") || l.contains("Exchange") ||
            l.contains("Aggregate") || l.contains("TakeOrdered") ||
            l.contains("Window") || l.contains("Generate") ||
            l.contains("Sort")) ||
          l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.startsWith("(")
      }
      out.append(keep.take(60).mkString("\n"))
      out.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
