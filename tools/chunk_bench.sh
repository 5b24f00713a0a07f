#!/bin/bash
# chunk_bench.sh [PREFIX] [TRIES_PER_CHUNK] — steal-evading bench: the
# full-suite hunter (quiet_bench.sh) needs one ~20-minute quiet window,
# which this host's co-tenant never grants; this variant needs only ~2
# quiet MINUTES at a time. SF_DIR (env, default /root/testdata/sf0.1)
# selects the data scale — the sf1 record rides the same machinery.
# Before launching, the chunk partition is AUDITED against the live
# suite (Bench list mode): a declared query missing from every chunk,
# or a chunk entry that no longer exists, aborts the run loudly. The
# suite is partitioned into family-aligned chunks (cache-sharing
# families — the md5-minhash frame consumers, the shingle families —
# stay together so the session-cache reuse the full suite legitimately
# gets is preserved within each chunk; the old 60-query dedup chunk is
# split at the shingle/classifier family boundary since r12 — a ~4.5 min
# exposure window never landed burst-free on a busy co-tenant day, a
# ~2 min one does), each chunk is launched behind a 40 s sustained-quiet gate and
# retried until ITS OWN record is steal-clean (every per-query steal
# <= 0.75 cores, chunk-wide <= 0.8, no DNF), and the clean chunk records
# merge into one BENCH-shaped JSON with per-query steal evidence.
set -u
PREFIX=${1:-/tmp/cbench}
TRIES=${2:-20}
SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
export SF_DIR
# steal acceptance gates (cores). Defaults are the r10 sf0.1 record
# discipline; on a day the co-tenant never grants a clean 3-minute
# window they can be relaxed EXPLICITLY (the record keeps per-query
# steal evidence either way, and 3-iter medians bound the residual
# inflation) — the failure mode being excluded is the 10-70x
# position-noise tail, which needs sustained saturation, not a
# fractional-core burst.
STEAL_Q=${STEAL_Q:-0.75}
STEAL_SUITE=${STEAL_SUITE:-0.8}
export STEAL_Q STEAL_SUITE
cd /root/repo
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)

CHUNKS=(
"minhash_pairs,blocking_quality,fellegi_sunter_weights,fs_score_separation,minhash_against,minhash_against_stream,dedup_canonical,dedup_clusters,decontaminate_fuzzy,cluster_best_quality,split_leakage_safe"
"ngram_jaccard_pairs,rouge_overlap_pairs,dup_triangles,dup_clustering_coef,kcore_dup_graph,bfs_hops_dup_graph,bellman_ford_dup,dup_spans,dedup_exact_docs,dedup_savings,dedup_first,dedup_last,dedup_none,dup_rate_by_source,contamination_sources,pipeline_clean_corpus,doc_length_quartiles,containment_pairs,winnow_fingerprints,winnow_overlap_pairs,novelty_docs,decontaminate_docs,corpus_diff,contrastive_triplets,dedup_exact_normalized,fuzzy_part_match,fuzzy_match_stream,cdc_classify_stream,lpa_modularity,graph_assortativity,lpa_communities,line_dedup,line_dedup_stream,line_collapse,source_similarity"
"top_ngrams,phrase_hits,vocab_growth,pmi_pairs,source_cap,lang_temperature_sample,quality_classifier,quality_quantile_norm,classifier_auc,classifier_prf,classifier_calibration,isotonic_calibration,calibration_ece,lift_gain_deciles,classifier_brier,hapax_ratio_sources,cohen_kappa_docs,simpson_diversity_sources,lang_chi2_sources,feature_mi_rank,ttr_docs,rake_keywords,textrank_keywords,zipf_slope_tokens"
"ann_hnsw_topk,ann_recall_hnsw,chunk_documents,chunk_retrieval,ann_jl_topk,embedding_against,embedding_near_dup,embedding_near_dup_auto,embedding_near_dup_lsh,semantic_dedup,ann_cosine_topk,ann_recall_eval,ann_recall_ivf,ann_recall_pq,ann_ivf_kmeans_topk,ann_ivf_topk,ann_lsh_multiprobe,ann_lsh_topk,ann_pq_adc_topk,ann_ivf_pq_topk,ann_sq_topk,pq_code_dups,pq_subcode_pairs,hybrid_rrf_topk,mmr_topk,centroid_assign,kmeans_assign,text_cluster_assign,cluster_top_terms,kmeans_silhouette,embedding_drift,ann_rq_topk"
"trigram_backoff,bigram_logprob,doremi_weights,negative_sample_tokens,bpe_tokens,bpe_tokens_expanded,bpe_tokens_learned,bpe_tokens_pretok,bpe_compression_eval,entropy_docs,fingerprint_docs,gopher_filter,kl_en_de,js_divergence_en_de,source_jsd_matrix,redact_docs,readability_docs,repetition_docs,text_profile,tfidf_top_terms,unigram_logprob,simhash_docs,split_assign,pack_sequences,token_budget_select,ccnet_buckets,dsir_weights,dsir_sample,gumbel_sample_sources,gumbel_sample_stream,hll_set_diff,bm25_topk,bm25_prf_topk,retrieval_eval,inverted_index,heavy_hitter_tokens,quantiles_binned_chars,shard_sizes,cms_token_counts,lang_id_ngram,lang_confusion,hll_vocab_overlap,maxsim_topk"
"partition_fingerprints,alignable,key_skew_orders,q3_shipping_priority,column_stats_customer,k_anonymity_audit,l_diversity_audit,t_closeness_audit,concat_aligned,coo_density,coo_todense,corr_qty_price,diag_coo,graph_color_groups,graph_degrees,identity_series,reindex_join,unique_row_ids,upsert_orders,upsert_pruned_orders,cube_revenue,yoy_revenue_growth,priority_chi2_years,rollup_nation_revenue,grouping_sets_revenue,cms_join_size,assoc_rules_parts,item_similarity_parts,mutual_nn_parts,dq_orders,ri_audit,spearman_qty_price,gini_customer_spend,link_pred_suppliers,pareto_parts,target_encode_segment"
"pagerank_suppliers,hits_suppliers,q5_nation_revenue,rolling_revenue_7d,acctbal_deciles,rfm_segments,q1_pricing_summary,q10_returned_items,q18_large_orders,q19_disjunctive_revenue,q4_order_priority,q6_forecast_revenue"
"group_bar_hist,group_hist_price,hist2d_qty_price,human_readable,pie_log10_orders,two_level_pie,pivot_status,smooth_gaussian,topk_orders,topk_per_segment,vc_quantity_bins,vc_returnflag,weighted_avg,media_frames"
"q7_region_volume,q8_market_share,q9_product_profit,q11_important_parts,q12_priority_lag,q13_customer_distribution,q14_promo_revenue,q15_top_supplier,q16_supplier_cnt,q17_small_qty_revenue,q20_red_part_suppliers,q21_waiting_supplier,q22_global_sales,q2_min_cost_supp"
"json_events,running_total_user,sessions_user,session_window_stats,rolling_corr_7d,attribution_position,split_overlap,stream_window_counts,time_window_daily,sample_at_most,sample_stratified,sample_weighted_replace,dsir_score_stream,asof_join_events,range_join_events,event_anomalies,mad_outliers,contingency_events,benford_totalprice,retention_cohorts,cohort_ltv,churn_labels,funnel_stages,funnel_times,dau_wau,hll_distinct_events,zorder_events,concurrency_daily,latency_bands,latency_bands_cont,latency_daily_p95,wilson_ci_types,topk_stream,hll_sliding_users,attribution_join,shapley_attribution,markov_removal,diff_in_diff_daily,bootstrap_ci_daily,kmv_sample_users,kmv_distinct_events,ams_f2_events,event_transitions,event_transitions_stream,cusum_error_shift,cusum_stream_shift,kaplan_meier_purchase,nelson_aalen_purchase,log_rank_purchase,log_rank_stratified,ab_test_value,uplift_by_segment,bh_fdr_welch,fisher_exact,sprt_daily,holt_daily_counts,croston_sparse_demand,seq_triples_events,winsorized_mean_status,ols_value_trend,mann_whitney_value,acf_daily_events,ks_value_click_error,kruskal_value_types,anova_value_types,ewma_daily_counts,fano_event_types,scd2_user_type,holt_winters_daily,classical_decomposition,seasonal_esd_anomalies,conformal_intervals,conformal_stream_daily,tdigest_value,binned_quantiles_stream,cuped_adjustment,cuped_stream_daily,group_sequential_obf,group_sequential_pocock,group_sequential_ld_obf,group_sequential_ld_pocock,group_sequential_ld_hsd,group_sequential_futility,conditional_power,quantile_regression_daily,theil_sen_daily,dow_anomalies,psi_value_drift,cond_entropy_transitions,forecast_eval_mase"
)

steal_sample() { # 5-second steal-cores + load1 sample
  local s1 t1 s2 t2
  read -r s1 t1 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
  sleep 5
  read -r s2 t2 < <(awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat)
  awk -v a=$((s2-s1)) -v b=$((t2-t1)) -v l="$(cut -d' ' -f1 /proc/loadavg)" \
    'BEGIN{printf "%.2f %s\n", (b>0)? a/b*32 : 99, l}'
}

rm -rf "$PREFIX.classes"; cp -r target/scala-2.13/classes "$PREFIX.classes"

# coverage audit: chunks must partition the live suite exactly
SPARK_GRAFT_BENCH_LIST=1 java $ADDOPENS -cp "$PREFIX.classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | sort > "$PREFIX.declared"
printf '%s\n' "${CHUNKS[@]}" | tr ',' '\n' | sort > "$PREFIX.chunked"
if ! diff -q "$PREFIX.declared" "$PREFIX.chunked" >/dev/null; then
  echo "chunk partition out of sync with the suite:" >&2
  diff "$PREFIX.declared" "$PREFIX.chunked" >&2
  exit 1
fi

ci=0
for chunk in "${CHUNKS[@]}"; do
  ci=$((ci+1))
  # resume: a clean record from an interrupted run of the SAME prefix
  # (and therefore the same binary — the classes snapshot is copied
  # once per prefix) still counts
  if [ -s "$PREFIX.c$ci.clean.json" ]; then
    echo "$(date -u +%F_%T) chunk $ci: clean record exists, skipping" >> "$PREFIX.log"
    continue
  fi
  done_chunk=0
  for try in $(seq 1 "$TRIES"); do
    quiet=0
    while [ $quiet -lt 8 ]; do
      read -r sc l1 < <(steal_sample)
      ok=$(awk -v s="$sc" -v l="$l1" 'BEGIN{print (s<0.4 && l<2.0)?1:0}')
      if [ "$ok" = 1 ]; then quiet=$((quiet+1)); else quiet=0; sleep 10; fi
    done
    echo "$(date -u +%F_%T) chunk $ci try $try: quiet, launching" >> "$PREFIX.log"
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_ONLY="$chunk" \
      java -Xmx8g $ADDOPENS -cp "$PREFIX.classes:/opt/spark/jars/*" graft.Bench \
      > "$PREFIX.c$ci.$try.json" 2> "$PREFIX.c$ci.$try.err"
    rc=$?
    verdict=$(python3 - "$PREFIX.c$ci.$try.json" <<'EOF'
import json,sys
try: d=json.loads(open(sys.argv[1]).readline())
except Exception: print("badjson"); raise SystemExit
qs=d.get("queries",{}); st=d.get("steal_cores",{})
dnf=[k for k,v in qs.items() if v<0]
import os
qthr=float(os.environ.get("STEAL_Q","0.75")); sthr=float(os.environ.get("STEAL_SUITE","0.8"))
hot=[k for k,v in st.items() if v>qthr]
ok=d.get("status")=="complete" and qs and not dnf and float(d.get("suite_steal_cores",99))<=sthr and not hot
print("clean" if ok else f"dirty dnf={dnf} hot={hot} suite={d.get('suite_steal_cores')}")
EOF
)
    echo "$(date -u +%F_%T) chunk $ci try $try rc=$rc $verdict" >> "$PREFIX.log"
    case "$verdict" in clean*)
      cp "$PREFIX.c$ci.$try.json" "$PREFIX.c$ci.clean.json"; done_chunk=1; break;;
    esac
    sleep 30
  done
  [ $done_chunk = 1 ] || echo "$(date -u +%F_%T) chunk $ci EXHAUSTED" >> "$PREFIX.log"
done

python3 - "$PREFIX" <<'EOF'
import glob, json, sys
prefix = sys.argv[1]
qs, st = {}, {}
chunks = sorted(glob.glob(prefix + ".c*.clean.json"))
for p in chunks:
    d = json.loads(open(p).readline())
    qs.update(d.get("queries", {}))
    st.update(d.get("steal_cores", {}))
import os
steal_q = os.environ.get("STEAL_Q", "0.75")
steal_suite = os.environ.get("STEAL_SUITE", "0.8")
rec = {"metric": "total", "value": sum(v for v in qs.values() if v >= 0),
       "unit": "sec", "queries": dict(sorted(qs.items())),
       "steal_cores": dict(sorted(st.items())),
       "iters": 3, "clear_cache": False,
       "status": f"complete_chunked({len(chunks)} chunks)",
       "sf": os.environ.get("SF_DIR", "/root/testdata/sf0.1"),
       "steal_gate_query_cores": float(steal_q),
       "steal_gate_suite_cores": float(steal_suite),
       "note": "family-aligned chunks, each measured in its own "
               f"sustained-quiet window (per-query steal <= {steal_q} "
               f"cores, chunk-wide <= {steal_suite})"}
json.dump(rec, open(prefix + ".merged.json", "w"))
print(f"{len(qs)} queries from {len(chunks)} clean chunks, total {rec['value']:.1f}s")
EOF
