"""Corpus-amplification stress: do the data-pipeline operators scale?

Amplifies the sf documents table Nx (doc_id offset + a per-replica
variant token, so replicas are near-dups rather than exact copies) into
a temp sf-dir layout, then times the flagship corpus operators at each
amplification. The number that matters is the TIME RATIO between
amplifications versus the DATA RATIO: a bucketed/linear operator should
grow ~linearly (ratio ≈ amp ratio); any quadratic candidate explosion
or single-task straggler shows up as a super-linear jump.

Usage: python tools/scale_stress.py [base_sf_dir] [out_json]
(defaults: /root/testdata/sf0.1, /tmp/scale_stress.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

import etl_pipeline_sam_gov_spark as eng  # noqa: E402
from etl_pipeline_sam_gov_spark.session import get_spark  # noqa: E402

AMPS = (1, 4, 16)

#: The operators whose scaling behavior carries the 100 TB argument.
STRESS_QUERIES = (
    "dedup_exact",            # hash groupBy — linear
    "dedup_minhash_lsh",      # LSH banding — linear iff buckets stay bounded
    "pipeline_training_corpus",  # curation DAG + two-phase prefix sum
    "text_quality_score",     # pure scan-side map
    "text_top_bigrams",       # explode + partial-combined count + top-k
    "text_chunk_sliding",     # narrow generate — must track the scan
    "dedup_crossdoc_ngrams",  # shingle df join — linear iff dup set bounded
    "text_quality_classifier",  # zero-shuffle hashed-weight fold — pure scan
    "curate_temperature_resample",  # tiny groupBy + broadcast + scan filter
    "text_bm25_retrieval",    # shared tf pass + broadcast model — linear
    "text_inverted_index",    # capped collect below one tok exchange
    "curate_dsir_importance", # two count passes + broadcast bucket model
    "curate_negative_pairs",  # generated-key equi-join — linear in anchors
    # (dedup_semantic_clusters is deliberately NOT stressed: its
    # within-cluster pair stage is quadratic in cluster size BY DESIGN,
    # bounded only when k grows with the corpus — the fixture pins k=8
    # for the oracle, so amplification would measure the known
    # quadratic, not a regression. Its skew-proof twin IS stressed:)
    "dedup_semantic_capped",  # sub-bucketed pair stage — linear at fixed cap
    # event-timeline family (reads the amplified events table):
    "sessionize_events",      # one timeline shuffle + windows
    "resample_interpolate_hourly",  # grid explode + merged-timeline walk
    "udf_ewma_user_values",   # applyInPandas recursion per user
    "agg_hypertable_rollup",  # mergeable 5-min partials → hourly merge
    # round-4 additions:
    "text_c4_gopher_filters",  # scan folds + one (doc_id, tok) exchange
    "text_bigram_perplexity",  # scan zip + model counts + broadcast score
    "window_cumulative_distinct_users",  # two aggs + days-sized window
    "multimodal_image_scanline_stats",   # two-stage mapInPandas, no shuffle
    # round-4 continuation additions (documents/events consumers; the
    # TPC-H-table consumers — dq suite, CDC diff, RFM, skyline, k-core
    # — aren't amplifiable by this tool, which only amplifies the
    # documents/events corpus):
    "markov_event_transitions",  # lag window + |types|² agg
    "ts_anomaly_rolling_z",      # ROWS-frame exact-int window
    "ml_naive_bayes_langid",     # model counts + |C|-bounded score join
    "ml_reliability_bins_quality",  # scoring scan + tiny percentile agg
    "multimodal_audio_channel_stats",  # two-stage mapInPandas, no shuffle
    "retrieval_hybrid_rrf",      # BM25 leg grows; dense leg fixed probes
    "attribution_position_based",  # user-keyed band join + purchase windows
    # TPC-H-side consumers (amplified key populations):
    "reco_item_lift",            # basket self-join bounded per order
    "graph_kcore_membership",    # per-round degree count + semi-joins
    "dq_constraint_suite",       # one agg per table + RI key join
    "dq_snapshot_diff_cdc",      # full-outer key join, delta filter
    "rfm_customer_segments",     # per-customer rollup + percentile bands
    "join_skyline_parts",        # local→global cumulative-max frontier
    "ab_test_proportions",       # user collapse + 2-row arm agg
    # (ann_*/ml_knn are deliberately NOT stressed: the query set grows
    # with the corpus by construction (vec_id % 50), so candidates grow
    # ~quadratically under amplification — that measures the fixture's
    # query-set rule, not the operator. ml_pca's cost is scan × d² with
    # d fixed — linear by construction, and 16x sf0.1 would explode
    # 4B covariance terms on this box for no extra signal.)
    # final round-4 batch (fixed-probe/bounded-state consumers):
    "text_heaps_vocab_growth",   # shingle explode + shard-sized windows
    "text_rake_keyphrase",       # positional explode + doc-keyed windows
    "curate_curriculum_order",   # scan score + 3-value percentile + shard sorts
    "dedup_url_canonicalized",   # regex canonical key + hash groupBy
    "multimodal_audio_zero_crossings",  # two-stage mapInPandas, no shuffle
    "agg_count_min_sketch",      # DEPTH-explode + bounded-cell merge
    "ts_stl_decompose_hourly",   # hour-grain collapse + calendar windows
    "ts_interval_union_spans",   # user-keyed cummax island walk
    "behavior_cohort_ltv",       # cohort collapse + (days²)-cell windows
    "ml_als_rank1",              # ratings collapse + two factor half-steps
    "similarity_maxsim_topk",    # fixed 24-subvector probes broadcast on scan
    "join_spatial_grid_radius",  # 9-cell blocking equi-join, int geometry
    "graph_hits_scores",         # |V|-row score vectors, edges never reshuffled
    "graph_bfs_hops",            # frontier joins + visited anti-joins
    "graph_random_walks",        # |V|-row frontier ⋈ ranked neighbors per step
    # round-4 final batch:
    "curate_length_bucket_batches",  # token scan + (bucket, shard)-bounded windows
    "ts_seasonal_naive_forecast_eval",  # hour-grain collapse + cell self-join
    "agg_gini_customer_spend",   # customer collapse + per-nation rank windows
    "dq_referential_orphans",    # 7 left joins, PK parents, scalar rollups
    "text_kneser_ney_bigram",    # one bigram count + vocab-sized rollup joins
    "ts_peak_concurrency_minutes",  # minute-grain deltas + day-partitioned walk
    "ts_ks_test_pairwise",       # cents-grid ECDFs + bounded pair join
    "ts_autocorrelation_hourly", # hour collapse + broadcast lag join
    "ts_welch_ttest_pairwise",   # per-type moments, |types|² pair stage
    "behavior_funnel_timebound", # three narrowing user-keyed MIN aggs
    "curate_leakage_free_split", # content-hash window + scan labeling
    "multimodal_image_entropy",  # two-stage mapInPandas, kernel-local reduce
    "text_source_vocab_jaccard", # (source, token) distinct + shared-token join
    "text_zipf_slope",           # token count + top-k head fit
    "analytics_lorenz_deciles",  # customer rollup + broadcast decile cuts
    "analytics_spend_band_migration",  # half-spend rollup + key full-outer
    "ml_kaplan_meier_repeat_purchase",  # customer-keyed window + day-axis curve
    "graph_degree_assortativity",  # degree joins + one scalar moment agg
    # round-4 closing batch:
    "ts_seasonality_strength",   # STL components + 1-row moment scorecard
    "ts_max_drawdown_hourly",    # hour-grain collapse + bounded-axis sweep
    "asof_join_forward",         # merged-timeline walk, mirrored frame
    "ab_test_cuped",             # user rollup + pooled moments
    "stream_funnel_timebound",   # GroupState chain, one user-keyed shuffle
    "dq_psi_value_drift",        # scan → ≤64 band cells
    "ml_information_value_spend",  # user rollup → ≤64 band cells
    "seq_session_trigrams",      # session exchange + two leads + top-k
    "dq_missing_hours_report",   # distinct hours + bounded lead walk
    "retrieval_ndcg_eval",       # shared tf pass + per-query bounded ranking
    # round-5 batch:
    "text_boilerplate_removal",  # chunk-text exchange + broadcast boiler set
    "graph_personalized_pagerank",  # frontier-sparse rank vectors per round
    # (ann_radius_search_lsh is excluded for the ann_* reason in its
    # strongest form: replicas are deliberate near-dups, so every
    # radius neighborhood gains one member per replica and the OUTPUT
    # grows ~quadratically with amplification — measured 5.1× at the
    # 16× step, all of it result rows, none of it plan shape.)
    "ml_embedding_whitening",    # dim-keyed int64 moments + broadcast-back
    "ml_isotonic_calibration",   # one group shuffle + O(n) PAV per group
    "ml_target_encoding",        # one (category, fold) agg; tiny tail math
    "ab_ipw_stratified_ate",     # one user rollup, then |strata|-cell math
    "fn_aes_roundtrip",          # scan-stage cipher expressions, no shuffle
    "ab_bootstrap_ci_poisson",   # user rollup + xB narrow generate + B cells
    "ml_lift_gain_table",        # scoring scan + ntile sort + K-cell math
    "dedup_suffix_prefix_overlap",  # two boundary keys/doc, one equi-join
    "udf_cusum_drift_alarm",     # user-keyed grouped-map, two-double state
    "ml_xicor_correlation",      # segment-partitioned rank windows
    "ml_conformal_interval",     # tagged scan + moments + one rank window
    "ab_mann_whitney_u",         # user rollup + distinct-value prefix sum
    "ab_sequential_sprt",        # per-arm ordered cumsum + first crossing
    "udf_holt_winters_hourly",   # (type,hour) collapse + per-type walk
    "udf_kalman_filter_users",   # user-keyed grouped-map, 3-double state
    "ab_propensity_caliper_match",  # user rollup + global merged walk
    "udf_croston_demand",        # purchase-subsequence grouped-map walk
    "dq_duplicate_charges",      # (user, cents) block join, oriented pairs
    "behavior_entropy_rate",     # user lag window + k²-cell aggregate
    "ts_exponential_fit_ks",     # type lag window + distinct-gap prefix sum
    "ab_bayesian_beta_binomial",  # lnfact prefix sum + conv_B-term sum
    # (ann_mmr_rerank inherits the ann_* exclusion: its query set grows
    # with the corpus by fixture rule, so amplification measures the
    # candidate-pool count, not the per-query O(K·C·dim) selection.)
    # (reco_user_user_cosine is deliberately NOT stressed: amplified key
    # populations multiply BOTH sides of its shared-item join, so
    # candidate volume grows ~quadratically under this tool's replica
    # scheme — measuring the fixture, not the operator; its hub cap is
    # the production knob that bounds per-item fan-out at cap².)
    # round-5 batch — under-stressed families (window/agg-sketch/graph
    # pair-join/dedup blocking/retrieval/streaming):
    "window_pattern_peaks",      # per-type lag/lead peak windows on events
    "window_rolling_trend_slope",  # ROWS-frame exact-int moment windows
    "window_moving_median",      # bounded-frame order statistic per user
    "agg_approx_sketches",       # HLL/KLL/topk partials — mergeable by design
    "agg_bitmap_distinct",       # exact bitmap ORs across day partials
    "agg_theta_sketch_audiences",  # theta-sketch set algebra on user sets
    "graph_triangle_count",      # edge²-bounded wedge join, support-pruned
    "graph_jaccard_neighbors",   # hub-capped pair self-join
    "dedup_levenshtein_blocked", # prefix-blocked + sorted-neighborhood pairs
    "dedup_fingerprint",         # winnowing fingerprint groupBy
    # (dedup_shingle_containment inherits the ann_radius exclusion in
    # its strongest form: replicas share ~every shingle with their
    # original, so every replica pair IS a true containment pair —
    # measured 25 → 4,972 result rows for 4× data at sf0.01, a 199×
    # TRUE-output explosion against which its 4.5× time growth is
    # massively sublinear per row. Pair-listing under mass duplication
    # is output-quadratic by problem statement; the production answer
    # is the cluster-collapse consumer (dedup_cc_clusters), which is
    # exactly how the repo pipelines it.)
    "retrieval_query_likelihood",  # Dirichlet LM: one tf pass + broadcast stats
    "retrieval_rocchio_prf",     # two-round retrieval, feedback centroid
    # (stream_cdc_snapshot_upsert is NOT stressable by this tool: it
    # materializes a snapshot + landing-zone directory pair per
    # invocation, and the second amplification's invocation races the
    # first's cleanup — a harness limitation, not a plan property;
    # stream_funnel_timebound already carries the streaming family's
    # scaling signal.)
    # round-5 second batch — the riskiest still-unstressed shapes:
    # pair/blocked joins, iterative loops, grouped walks, salt paths.
    # (dedup_ngram_jaccard and dedup_simhash_blocked inherit the
    # dedup_shingle_containment exclusion: replicas are TRUE near-dups,
    # so the pair LISTING grows quadratically by problem statement —
    # measured 25 → 3,400 → 66,400 result rows (ngram) and 4,323 →
    # 462,462 (simhash) across 1x/4x/16x at sf0.01; time ratios 15.2x
    # and 6.7x per 4x step are massively SUBLINEAR per output row.
    # The cluster-collapse consumer is the production scale path:)
    "dedup_cluster_components",  # label-propagation loop, persisted labels
    "graph_pagerank_bipartite",  # headline: 3 rounds over cached edges
    "graph_label_propagation",   # iterative mode-label joins
    "graph_adamic_adar_links",   # common-neighbor pair join (hub-capped)
    "graph_clustering_coefficient",  # wedge join vs triangle count
    "ml_kmeans_embeddings",      # iterative broadcast-centroid assign
    "ml_logistic_regression_gd", # fixed GD rounds, one scan each
    "ml_mutual_information",     # (band, label) cell counts
    "ml_auc_quality_classifier", # score-domain rank windows
    "join_fuzzy_name_match",     # blocked edit-distance pair join
    "join_salted_skewed_orders", # salted hot-key join path
    "join_interval_overlap_incidents",  # grid-bucketed interval overlap
    "join_lateral_topk_orders",  # per-key LATERAL top-N
    "asof_join_purchase_click",  # merged-timeline as-of walk on events
    # (multimodal_image_dhash_pairs inherits the pair-lister exclusion
    # in its purest form: the amplifier replicates image BLOBS
    # byte-identically, so every replica pair is a true duplicate pair
    # and the dHash blocks fill with identical hashes — output and
    # verify work grow amp² by problem statement (measured 2.9 s → 40 s
    # at the 4x step). Cluster-collapse is the production consumer.)
    "multimodal_shot_boundaries",  # frame-kernel + per-video walk
    "text_decontaminate_eval_overlap",  # corpus n-grams ⋈ bounded eval set
    "text_bpe_merge_rounds",     # headline: iterative vocab induction
    "text_tfidf_keywords",       # tf pass + df join + per-doc top-k
    "curate_pack_token_shards",  # two-phase prefix-sum packing
    "curate_stratified_sample",  # per-stratum hash-threshold sample
    "curate_sample_k_per_group", # per-group top-k windows
    "sessionize_funnel",         # session exchange + step MIN chain
    "streak_longest_daily",      # per-user day-island walk
    "cohort_retention_daily",    # cohort collapse + (cohort, day) cells
    "seq_pattern_support",       # per-session subsequence explode
    "reco_eval_coverage_novelty",  # recs ⋈ catalog popularity eval
    "agg_table_profile",         # per-column profile union
    "agg_corr_matrix",           # d²-cell moments, d fixed
    "agg_salted_heavy_hitters",  # two-phase salted heavy-hitter agg
    "agg_weighted_median",       # weight-domain prefix-sum median
    "dq_key_discovery",          # per-candidate distinct-count profile
    "retrieval_phrase_proximity",  # positional posting self-join
    "scd2_user_value_history",   # user-keyed change windows
    "udf_viterbi_2state",        # grouped-map DP walk per user
    "pipeline_experiment_report",  # composed CUPED+SRM+MWU DAG
    "ts_level_shift_detect",     # per-(type, slice) frames, overlap carry
    # round-6 batch — the riskiest still-unstressed shapes: incremental
    # dedup joins, iterative boosting, correlated TPC-H subqueries,
    # composed DQ/curation DAGs, recursive walks, streaming state.
    # (dedup_winnowing_pairs inherits the pair-lister exclusion:
    # replicas share ~every winnowing fingerprint with their original,
    # so pair output grows amp² by problem statement — the
    # cluster-collapse consumer is the scale path. fn_* scalar-function
    # demos and sql_* surface demos are scan-side expression showcases
    # with no shuffle to mis-scale and stay out.)
    "dedup_incremental_new_docs",  # new-slice ⋈ corpus fingerprint join
    "dedup_keep_best_quality",   # dup-key groupBy + per-group argmax
    "dedup_minhash_estimate_quality",  # sig-pair estimate vs exact verify
    "recursive_hierarchy_walk",  # iterative parent-chain joins
    "graph_modularity_nations",  # |nations|-cell community contrast
    "graph_conductance_nations", # cut/volume ratios per community
    "graph_summary_stats",       # degree rollup → one summary row
    "ml_gbm_stumps",             # iterative boosting: residual scan/round
    "ml_classifier_scorecard",   # composed train+eval+calibration DAG
    "ts_granger_causality",      # per-type lag regression cells
    "ts_hurst_exponent",         # R/S rescaled-range over dyadic scales
    "window_range_price_neighborhood",  # RANGE frame over price domain
    "window_topk_docs_per_lang", # per-lang rank window + k cut
    "q17_small_quantity_revenue",  # correlated per-part AVG subquery
    "q18_large_volume_customers",  # HAVING-gated key semi-join
    "q20_heavy_red_suppliers",   # nested semi over part/lineitem halves
    "text_repetition_quality",   # intra-doc n-gram repetition ratios
    "text_unigram_nll",          # corpus LM + per-doc NLL broadcast-back
    "agg_key_skew_profile",      # per-key counts → skew moments
    "agg_embedding_centroids",   # dim-explode centroid moments
    "agg_join_size_estimate",    # per-key sketch → join cardinality est
    "dq_k_anonymity_audit",      # quasi-identifier groupBy + k histogram
    "curate_oversample_replicate",  # weight-driven explode replication
    "set_intersect_all_quantities",  # INTERSECT ALL via paired counts
    "pipeline_health_report",    # composed DQ DAG (headline)
    "pipeline_corpus_curation",  # composed curation DAG v1
    "stream_stateful_user_totals",  # GroupState running totals cycle
    "stream_dedup_watermark",    # watermarked dropDuplicates cycle
    # round-6 second batch — remaining unstressed shapes with any
    # shuffle of their own: as-of variants, mergeable sketch rollups,
    # global sort/offset, MERGE upsert, PIT snapshots, more streaming.
    "asof_join_nearest",         # merged-timeline nearest walk
    "asof_join_with_tolerance",  # tolerance-gated as-of match
    "behavior_time_decay_score", # per-user decay-weighted rollup
    "ml_kfold_cv_stump",         # K hash-fold train/eval scans
    "ml_precision_recall_curve", # score-ranked cumulative confusion
    "ml_cochran_armitage_trend", # dose-ordered proportions trend
    "agg_kll_quantile_merge",    # KLL partials → merged quantiles
    "agg_bitmap_rollup_daily",   # exact bitmap ORs across day grain
    "agg_exponential_histogram", # log-banded histogram cells
    "agg_mad_outliers",          # two-phase median-of-deviations
    "multimodal_patch_grid_stats",  # patch-grid kernel, per-doc reduce
    "stream_sliding_quarter",    # overlapping sliding windows cycle
    "stream_session_windows",    # session-gap windows cycle
    "stream_hypertable_rollup",  # stream-maintained 5-min partials
    "text_langid",               # n-gram profile scoring scan
    "dq_profile_drift",          # two-slice profile compare
    "analytics_growth_waterfall",  # period-over-period bridge cells
    "curate_split_train_holdout",  # hash-coin deterministic split
    "scd2_as_of_snapshot",       # PIT validity-interval filter
    "merge_incremental_upsert",  # full-outer MERGE upsert (headline)
    "sort_offset_pagination",    # global sort + offset page cut
    "q2_min_cost_supplier",      # correlated per-part MIN subquery
    "q22_idle_rich_customers",   # scalar-avg gate + anti join
    # pinned after the r6 full-coverage sweep's row column caught their
    # heartbeat landing reading ZERO files from directory sources —
    # keep measuring the replay row counts so the class can't recur:
    "stream_left_outer_join_purchases",  # watermark-flushed outer join
    "stream_session_timeout_close",      # GroupState timeout closes
    # round-7 promotions (VERDICT r06 next-round #6): the most
    # informative of the r6 full-coverage AD-HOC sweep — everything
    # whose worst step ratio landed near the ≲4 threshold in
    # STRESS_FULL_r06.json plus the remaining iterative/grouped-walk
    # shapes, so they get the pinned best-of-2 + rows discipline every
    # round instead of once. (The brief's six named queries —
    # recursive_hierarchy_walk, text_repetition_quality,
    # graph_conductance_nations, window_range_price_neighborhood,
    # multimodal_patch_grid_stats, ml_precision_recall_curve — were
    # already pinned in the round-6 batches above.)
    "ml_ridge_regression",       # normal-equation moments (r6 4.87 first step — re-adjudicated r7)
    "agg_rollup",                # headline multi-dim agg (3.78 at 16×)
    "fn_try_arithmetic",         # try_* scan expressions (3.68)
    "agg_aqp_sample_estimate",   # TABLESAMPLE estimate + correction (3.67)
    "udf_grouped_agg_pandas",    # pandas grouped-agg lane (3.41)
    "ml_linear_regression_closed_form",  # X'X moment solve (3.40)
    "text_redact_pii",           # regex scan map (3.24; bench wobble watch)
    "ml_shapley_r2_attribution", # 2^d subset R² lattice (3.20)
    "agg_cube",                  # cube lattice expand (3.14)
    "agg_grouping_sets",         # grouping-set expand (3.00)
    "udf_holt_linear_users",     # grouped-map double-exponential walk (3.07)
    "ml_bagged_stumps",          # iterative bootstrap ensemble (2.93)
    "ml_spearman_rho",           # two rank windows + moment agg (2.89)
    "udf_grouped_map_zscore",    # grouped-map normalize lane (2.52)
)


def amplify(spark, base_dir: str, amp: int, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    reps = spark.range(amp).withColumnRenamed("id", "rep")
    amped = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000))
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" variant"), F.col("rep"))
            ),
        )
        .drop("rep")
    )
    amped.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    # Events: each replica is a NEW user population (user_id offset) with
    # a small deterministic timestamp jitter, so per-user timelines stay
    # realistic (amplification grows the number of timelines — the
    # dimension a cluster parallelizes over — not their length).
    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    amped_ev = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(1_000_000_000))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * F.lit(1_000_000))
        .withColumn(
            "ts",
            F.col("ts") + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("rep") * F.lit(0.000137)),
        )
        .drop("rep")
    )
    amped_ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    # Embeddings: replicas are near-dup vectors (vec_id offset + a tiny
    # rep-dependent shift on the first coordinate — below the 2^-10
    # quantization grid's duplicate threshold but nonzero, so replicas
    # cluster together and the capped pair stage does real work).
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    amped_emb = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(1_000_000_000))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, (x + F.col("rep") * F.lit(0.001)).cast("float")
                ).otherwise(x),
            ),
        )
        .drop("rep")
    )
    amped_emb.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    # TPC-H-side tables: each replica is a NEW key population (orderkey/
    # custkey/partkey/suppkey offsets kept mutually consistent so joins
    # still land), which grows entity counts — the dimension a cluster
    # parallelizes over — without stretching any single entity's
    # footprint. Needed by the relational-side stressed operators
    # (market basket, k-core, dq suite, CDC diff, RFM, skyline).
    key_offsets = {
        "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 1_000_000},
        "lineitem": {
            "l_orderkey": 1_000_000_000,
            "l_partkey": 10_000_000,
            "l_suppkey": 10_000,
        },
        "customer": {"c_custkey": 1_000_000},
        "part": {"p_partkey": 10_000_000},
    }
    for table, offsets in key_offsets.items():
        df = spark.read.parquet(os.path.join(base_dir, f"{table}.parquet"))
        amped_t = df.crossJoin(F.broadcast(reps))
        for col, off in offsets.items():
            amped_t = amped_t.withColumn(
                col, F.col(col) + F.col("rep") * F.lit(off)
            )
        if table == "customer":
            # Replica customers are NEW entities: re-derive the name
            # from the offset key (the fixture's own format) so
            # name-keyed operators (fuzzy ER blocking) see distinct
            # entity populations, not amp duplicates of every name.
            amped_t = amped_t.withColumn(
                "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
            )
        amped_t.drop("rep").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
    # Fixed-cardinality dims (nation/region/supplier) copy through
    # unamplified: they are the bounded side of every join that uses
    # them, and growing them would change the queries' semantics
    # (amplification grows entity populations, not the world's
    # geography). Replica entities keyed past the original supplier
    # range simply read as unmatched — fine for timing runs, which
    # never consult an oracle.
    for table in ("nation", "region", "supplier"):
        src = os.path.join(base_dir, f"{table}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{table}.parquet")
            )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_stress.json"
    only = os.environ.get("SPARK_GRAFT_STRESS_ONLY")
    queries = tuple(only.split(",")) if only else STRESS_QUERIES
    # VERDICT r05 #4: an "output-bound" adjudication must MEASURE the
    # output. With rows tracking on, each (query, amp) also records its
    # result-row count, and the summary prints rows-ratio NEXT TO
    # time-ratio per step: a pair-lister is legitimately excused only
    # while time grows no faster than rows (time_ratio ≲ rows_ratio,
    # i.e. flat-to-sublinear per output row). The dHash mis-call is the
    # motivating case: its amp² TIME was excused as output growth
    # without anyone counting the rows — with this column the quadratic
    # join would have shown time outrunning rows.
    track_rows = os.environ.get("SPARK_GRAFT_STRESS_ROWS") == "1"
    spark = get_spark("scale-stress")
    results: dict[str, dict[int, float]] = {q: {} for q in queries}
    out_rows: dict[str, dict[int, int]] = {q: {} for q in queries}
    root = tempfile.mkdtemp(prefix="spark_graft_stress_")
    try:
        for amp in AMPS:
            d = os.path.join(root, f"amp{amp}")
            os.makedirs(d, exist_ok=True)
            amplify(spark, base, amp, d)
            n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            for q in queries:
                # Best of 2: a single cold run folds one-time codegen/JIT
                # and any transient machine load into the ratio — one bad
                # sample then reads as a fake super-linear verdict
                # (observed: an isolated re-run of a "7.6x" query measured
                # 1.9x). The second run still clears the cache, so it
                # re-executes the full pipeline, not cached data.
                dt = float("inf")
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    eng.QUERIES[q](spark, d).write.format("noop").mode("overwrite").save()
                    dt = min(dt, time.perf_counter() - t0)
                results[q][amp] = round(dt, 3)
                extra = ""
                if track_rows:
                    out_rows[q][amp] = eng.QUERIES[q](spark, d).count()
                    extra = f"  rows={out_rows[q][amp]}"
                print(
                    f"amp={amp:2d} ({n} docs) {q:28s} {dt:7.3f}s{extra}",
                    flush=True,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("\nscaling (time ratio vs 4x data ratio — ≲4 is linear-or-better):")
    verdicts = {}
    for q in queries:
        r41 = results[q][4] / results[q][1]
        r164 = results[q][16] / results[q][4]
        verdicts[q] = {"t": results[q], "r_4_over_1": round(r41, 2),
                       "r_16_over_4": round(r164, 2)}
        line = f"  {q:28s} 4x/1x={r41:5.2f}  16x/4x={r164:5.2f}"
        if track_rows and out_rows[q]:
            rr41 = out_rows[q][4] / max(1, out_rows[q][1])
            rr164 = out_rows[q][16] / max(1, out_rows[q][4])
            verdicts[q]["rows"] = out_rows[q]
            verdicts[q]["rows_4_over_1"] = round(rr41, 2)
            verdicts[q]["rows_16_over_4"] = round(rr164, 2)
            line += f"  rows 4x/1x={rr41:7.2f}  16x/4x={rr164:7.2f}"
        print(line)
    with open(out_json, "w") as f:
        json.dump({"base": base, "amps": AMPS, "results": verdicts}, f, indent=1)


if __name__ == "__main__":
    main()
